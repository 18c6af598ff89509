"""End-to-end loss-curve parity against the reference's OWN engine code.

VERDICT r2 item 1: the module-level golden tests pin forwards/losses/one
optimizer step; these tests execute the reference's actual train loops —
run_stage1.train_one_epoch (run_stage1.py:294-505, incl. its dual-stream
target cycling, attention-multinomial masking and per-step LR writes),
engine_for_finetuning.train_one_epoch (:48-171, incl. update_freq grad
accumulation), and run_stage3.train_one_epoch (:340-710, incl. committee
masks + clip_matchORconf selection + confidence-weighted pseudo-label CE) —
for ≥20 optimizer steps on tiny models/synthetic clips, and assert the
unite_tpu engines reproduce the loss sequences given identical inputs and
identical stochastic draws (masks captured from torch.multinomial, CLIP
similarities injected on both sides).

Everything stochastic is pinned; videos are pre-rounded to
bf16-representable values so our device-side input cast is lossless.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import ref_harness as rh  # noqa: E402
from test_golden_reference import (  # noqa: E402
    _import_ref_teacher_params,
    _ref_modules,
    _tiny_ref_teacher,
    _to_torch_video,
)

# tiny geometry shared by all three stages: 32² frames, patch 16 → 4
# patches/frame, 2 frames → 8 patches/video
S, T = 32, 2
N_PF, N_PATCH = 4, 8
MASK_RATIO = 0.5
NV_FRAME = N_PF - int(N_PF * MASK_RATIO)
NV = NV_FRAME * T


def _opt_args(lr, weight_decay=0.05):
    a = types.SimpleNamespace()
    a.opt = "adamw"
    a.lr = lr
    a.weight_decay = weight_decay
    a.opt_eps = 1e-8
    a.opt_betas = (0.9, 0.999)
    a.momentum = 0.9
    return a


def _make_tiny_pair(tmp_path, ma, clip_return_layers=(0, 1), seed=2):
    """Reference tiny adaptation student + our counterpart with imported
    params (the same export/import chain as the golden stage-1 test)."""
    torch.manual_seed(seed)
    ref_student = ma.AdaptationVisionTransformer(
        img_size=S, patch_size=16, encoder_embed_dim=48, encoder_depth=2,
        encoder_num_heads=2, mlp_ratio=4, qkv_bias=True, init_values=0.0,
        num_frames=T, tubelet_size=1, clip_decoder_embed_dim=48,
        clip_output_dim=24, clip_return_layers=list(clip_return_layers),
    ).train()

    pth = tmp_path / "ref_student.pth"
    torch.save({"model": ref_student.encoder.state_dict()}, pth)
    dec_pth = tmp_path / "ref_decoders.pth"
    torch.save({"model": ref_student.state_dict()}, dec_pth)

    from unite_tpu.models.adaptation import AdaptationVisionTransformer
    from unite_tpu.train.run_stage1 import load_student

    student = AdaptationVisionTransformer(
        img_size=S, patch_size=16, encoder_embed_dim=48, encoder_depth=2,
        encoder_num_heads=2, mlp_ratio=4, qkv_bias=True, init_values=None,
        num_frames=T, tubelet_size=1, clip_decoder_embed_dim=48,
        clip_output_dim=24, clip_return_layers=tuple(clip_return_layers),
        norm_eps=1e-5,
    )

    class A:
        student_init = str(pth)
        model_key = "model|module"
        clip_decoder_init = str(dec_pth)
        input_size = S
        patch_size = 16
        num_frames = T
        tubelet_size = 1
        use_cls_token = False

    example = jnp.zeros((1, T, S, S, 3), jnp.float32)
    sp = student.init(jax.random.PRNGKey(0), example,
                      jnp.zeros((1, NV), jnp.int32), True)["params"]
    sp = load_student(A, sp)
    return ref_student, student, sp


def test_stage1_engine_loss_curve_parity(tmp_path):
    """20 steps of the reference's inline stage-1 loop (dual-stream
    source+target with target-iterator cycling, attention-multinomial
    masking, per-step cosine LR into param groups, AdamW via the reference
    optim factory) vs our jitted step fed the captured mask draws."""
    rs1 = rh.import_ref("run_stage1")
    ru = rh.import_ref("src.utils")
    rof = rh.import_ref("src.optim_factory")
    _, ma, mc = _ref_modules()
    rh.install_shims()

    STEPS, B_S, B_T = 20, 2, 2
    B = B_S + B_T
    ref_student, student, sp = _make_tiny_pair(tmp_path, ma)
    ref_teacher = _tiny_ref_teacher(mc, S)

    from unite_tpu.models.clip import CLIPVisionTransformer

    teacher = CLIPVisionTransformer(
        input_resolution=S, patch_size=16, width=64, layers=2, heads=2,
        output_dim=24, return_attn=True, return_index=(0, 1),
    )
    example = jnp.zeros((1, T, S, S, 3), jnp.float32)
    tp = _import_ref_teacher_params(ref_teacher, teacher, S, example)

    rng = np.random.default_rng(0)
    vids_s = rh.bf16_representable(
        rng.normal(size=(STEPS, B_S, T, S, S, 3)).astype(np.float32) * 0.5)
    vids_t = rh.bf16_representable(
        rng.normal(size=(7, B_T, T, S, S, 3)).astype(np.float32) * 0.5)

    # identical per-step LR table for both sides (schedule generation is
    # golden-tested separately; this test pins the ENGINE's application)
    from unite_tpu.utils.schedules import cosine_scheduler

    lr_tab = cosine_scheduler(1e-3, 1e-5, epochs=2, niter_per_ep=10,
                              warmup_epochs=1, start_warmup_value=1e-6)
    assert len(lr_tab) == STEPS

    # ---- reference run ------------------------------------------------
    dummy_mask = torch.zeros(1)
    src_loader = [(_to_torch_video(vids_s[i]), dummy_mask,
                   torch.zeros(B_S, dtype=torch.long)) for i in range(STEPS)]
    tgt_loader = [(_to_torch_video(vids_t[i]), dummy_mask,
                   torch.zeros(B_T, dtype=torch.long)) for i in range(7)]

    opt = rof.create_optimizer(_opt_args(lr=1e-3), ref_student,
                               skip_list=ref_student.no_weight_decay())
    args = types.SimpleNamespace(log_freq=10, epochs=1,
                                 clip_loss_data="target")
    torch.manual_seed(123)
    with rh.MeterTap(ru) as tap, rh.MultinomialTap() as mtap:
        rs1.train_one_epoch(
            ref_student, src_loader, tgt_loader, opt,
            torch.device("cpu"), 0, rh.make_native_scaler(), None,
            start_steps=0, lr_schedule_values=lr_tab,
            wd_schedule_values=None, teacher_model=ref_teacher,
            clip_input_resolution=S, clip_loss_type="l2",
            mask_type="attention", mask_ratio=MASK_RATIO,
            use_wandb=False, args=args,
        )
    ref_losses = tap.taps["loss"]
    assert len(ref_losses) == STEPS
    assert len(mtap.draws) == STEPS

    # ---- our run with the captured masks ------------------------------
    from unite_tpu.engines.pretrain_umt import make_pretrain_train_step
    from unite_tpu.optim.factory import create_optimizer
    from unite_tpu.train.train_state import TrainState

    tx, _ = create_optimizer("adamw", lr=lr_tab, params=sp,
                             weight_decay=0.05, betas=(0.9, 0.999), eps=1e-8)
    state = TrainState.create(sp, tx)
    step = jax.jit(make_pretrain_train_step(
        student, teacher, num_patches=N_PATCH, frames=T,
        mask_ratio=MASK_RATIO, source_batch_size=B_S,
        clip_loss_data="target", clip_input_resolution=S,
    ))
    our_losses = []
    for i in range(STEPS):
        videos = np.concatenate([vids_s[i], vids_t[i % 7]])
        vis_idx = rh.importance_to_vis_idx(mtap.draws[i], NV_FRAME, B)
        batch = {"videos": jnp.asarray(videos),
                 "vis_idx": jnp.asarray(vis_idx)}
        state, m = step(state, tp, batch, jax.random.PRNGKey(0))
        our_losses.append(float(m["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, atol=5e-4, rtol=2e-3)


def test_stage2_engine_loss_curve_parity(tmp_path):
    """24 micro-steps (12 optimizer steps, update_freq=2) of the reference
    finetune engine — label-smoothed CE, layer-decay param groups, per-step
    LR — vs our jitted step with optax.MultiSteps accumulation."""
    eff = rh.import_ref("src.engines.engine_for_finetuning")
    ru = rh.import_ref("src.utils")
    rof = rh.import_ref("src.optim_factory")
    mf, _, _ = _ref_modules()
    rh.install_shims()

    MICRO, UPDATE_FREQ, B, NC = 24, 2, 3, 5
    STEPS = MICRO // UPDATE_FREQ
    DEPTH = 2
    torch.manual_seed(5)
    ref = mf.VisionTransformer(
        img_size=S, patch_size=16, num_classes=NC, embed_dim=48, depth=DEPTH,
        num_heads=2, mlp_ratio=4, qkv_bias=True, all_frames=T,
        tubelet_size=1, use_mean_pooling=True, init_scale=1.0,
    ).train()
    pth = tmp_path / "ref_vit.pth"
    torch.save({"model": ref.state_dict()}, pth)

    rng = np.random.default_rng(3)
    vids = rh.bf16_representable(
        rng.normal(size=(MICRO, B, T, S, S, 3)).astype(np.float32) * 0.5)
    labels = rng.integers(0, NC, size=(MICRO, B))

    from unite_tpu.utils.schedules import cosine_scheduler

    lr_tab = cosine_scheduler(5e-4, 1e-6, epochs=2, niter_per_ep=6,
                              warmup_epochs=1, start_warmup_value=1e-6)
    assert len(lr_tab) == STEPS

    # ---- reference run ------------------------------------------------
    assigner = rof.LayerDecayValueAssigner(
        [0.65 ** (DEPTH + 1 - i) for i in range(DEPTH + 2)])
    opt = rof.create_optimizer(
        _opt_args(lr=5e-4), ref, skip_list=ref.no_weight_decay(),
        get_num_layer=assigner.get_layer_id,
        get_layer_scale=assigner.get_scale,
    )
    smoothing = 0.1
    import timm.loss as tl

    criterion = tl.LabelSmoothingCrossEntropy(smoothing=smoothing)
    loader = [(_to_torch_video(vids[i]),
               torch.tensor(labels[i], dtype=torch.long), None, None)
              for i in range(MICRO)]
    with rh.MeterTap(ru) as tap:
        eff.train_one_epoch(
            ref, criterion, loader, opt, torch.device("cpu"), 0,
            rh.make_native_scaler(), max_norm=None, model_ema=None,
            mixup_fn=None, start_steps=0, lr_schedule_values=lr_tab,
            wd_schedule_values=None, num_training_steps_per_epoch=STEPS,
            update_freq=UPDATE_FREQ, num_epochs=1,
        )
    ref_losses = tap.taps["loss"]
    assert len(ref_losses) == MICRO

    # ---- our run ------------------------------------------------------
    import optax

    from unite_tpu.engines.finetune import make_finetune_train_step
    from unite_tpu.models.vit import VisionTransformer
    from unite_tpu.optim.factory import create_optimizer
    from unite_tpu.train.run_stage2 import load_finetune_ckpt
    from unite_tpu.train.train_state import TrainState

    ours = VisionTransformer(
        img_size=S, patch_size=16, num_classes=NC, embed_dim=48, depth=DEPTH,
        num_heads=2, mlp_ratio=4, qkv_bias=True, all_frames=T,
        tubelet_size=1, use_mean_pooling=True, norm_eps=1e-5,
    )

    class A:
        finetune = str(pth)
        model_key = "model|module"
        nb_classes = NC
        delete_head = False
        input_size = S
        patch_size = 16
        num_frames = T
        tubelet_size = 1
        use_mean_pooling = True

    params = ours.init(jax.random.PRNGKey(0),
                       jnp.asarray(vids[0]))["params"]
    params = load_finetune_ckpt(A, ours, params)
    tx, _ = create_optimizer(
        "adamw", lr=lr_tab, params=params, weight_decay=0.05,
        betas=(0.9, 0.999), eps=1e-8, num_layers=DEPTH, layer_decay=0.65,
    )
    tx = optax.MultiSteps(tx, every_k_schedule=UPDATE_FREQ)
    state = TrainState.create(params, tx)
    step = jax.jit(make_finetune_train_step(ours, label_smoothing=smoothing))
    our_losses = []
    for i in range(MICRO):
        batch = {"videos": jnp.asarray(vids[i]),
                 "labels": jnp.asarray(labels[i], dtype=jnp.int32)}
        state, m = step(state, batch, jax.random.PRNGKey(0))
        our_losses.append(float(m["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, atol=5e-4, rtol=2e-3)


def test_stage2_engine_mixup_ema_parity(tmp_path):
    """24 micro-steps (update_freq=2) of the reference finetune engine with
    mixup ACTIVE (SoftTargetCrossEntropy, run_stage2.py:675-677) and a live
    timm-legacy ModelEma — vs our jitted step with the ``soft_targets``
    injection hook and the fused EMA.  Mixup draws are pinned by computing
    the mixed clips + soft targets once in numpy and injecting them
    identically on both sides.  Asserts the loss curve AND a functional
    probe of the EMA weights (eval forward from EMA params on held-out
    clips), which pins the accumulation-boundary gating: the reference
    updates the EMA once per OPTIMIZER step (engine_for_finetuning.py:
    109-126), not per micro step."""
    eff = rh.import_ref("src.engines.engine_for_finetuning")
    ru = rh.import_ref("src.utils")
    rof = rh.import_ref("src.optim_factory")
    mf, _, _ = _ref_modules()
    rh.install_shims()

    MICRO, UPDATE_FREQ, B, NC = 24, 2, 4, 5
    STEPS = MICRO // UPDATE_FREQ
    DEPTH, DECAY, SMOOTH = 2, 0.95, 0.1
    torch.manual_seed(6)
    ref = mf.VisionTransformer(
        img_size=S, patch_size=16, num_classes=NC, embed_dim=48, depth=DEPTH,
        num_heads=2, mlp_ratio=4, qkv_bias=True, all_frames=T,
        tubelet_size=1, use_mean_pooling=True, init_scale=1.0,
    ).train()
    pth = tmp_path / "ref_vit.pth"
    torch.save({"model": ref.state_dict()}, pth)

    rng = np.random.default_rng(4)
    vids = rng.normal(size=(MICRO, B, T, S, S, 3)).astype(np.float32) * 0.5
    labels = rng.integers(0, NC, size=(MICRO, B))
    lams = rng.uniform(0.2, 0.9, size=MICRO).astype(np.float32)
    # host mixup pinned in numpy: x = lam·x + (1−lam)·x.flip(0) with timm's
    # mixup_target smoothing (reference mixup.py:37-48 one_hot on/off)
    off = SMOOTH / NC
    on = 1.0 - SMOOTH + off
    mixed = np.empty_like(vids)
    soft = np.empty((MICRO, B, NC), np.float32)
    for i in range(MICRO):
        mixed[i] = lams[i] * vids[i] + (1 - lams[i]) * vids[i, ::-1]
        y1 = np.full((B, NC), off, np.float32)
        y1[np.arange(B), labels[i]] = on
        y2 = np.full((B, NC), off, np.float32)
        y2[np.arange(B), labels[i][::-1]] = on
        soft[i] = lams[i] * y1 + (1 - lams[i]) * y2
    mixed = rh.bf16_representable(mixed)

    from unite_tpu.utils.schedules import cosine_scheduler

    lr_tab = cosine_scheduler(5e-4, 1e-6, epochs=2, niter_per_ep=6,
                              warmup_epochs=1, start_warmup_value=1e-6)
    assert len(lr_tab) == STEPS

    # ---- reference run ------------------------------------------------
    assigner = rof.LayerDecayValueAssigner(
        [0.65 ** (DEPTH + 1 - i) for i in range(DEPTH + 2)])
    opt = rof.create_optimizer(
        _opt_args(lr=5e-4), ref, skip_list=ref.no_weight_decay(),
        get_num_layer=assigner.get_layer_id,
        get_layer_scale=assigner.get_scale,
    )
    import timm.loss as tl
    from timm.utils import ModelEma

    criterion = tl.SoftTargetCrossEntropy()
    ema = ModelEma(ref, decay=DECAY)
    calls = {"n": 0}

    def stub_mixup(samples, targets):
        i = calls["n"]
        calls["n"] += 1
        return _to_torch_video(mixed[i]), torch.tensor(soft[i])

    loader = [(_to_torch_video(vids[i]),
               torch.tensor(labels[i], dtype=torch.long), None, None)
              for i in range(MICRO)]
    with rh.MeterTap(ru) as tap:
        eff.train_one_epoch(
            ref, criterion, loader, opt, torch.device("cpu"), 0,
            rh.make_native_scaler(), max_norm=None, model_ema=ema,
            mixup_fn=stub_mixup, start_steps=0, lr_schedule_values=lr_tab,
            wd_schedule_values=None, num_training_steps_per_epoch=STEPS,
            update_freq=UPDATE_FREQ, num_epochs=1,
        )
    ref_losses = tap.taps["loss"]
    assert len(ref_losses) == MICRO
    assert calls["n"] == MICRO

    # ---- our run ------------------------------------------------------
    import optax

    from unite_tpu.engines.finetune import (
        make_eval_step,
        make_finetune_train_step,
    )
    from unite_tpu.models.vit import VisionTransformer
    from unite_tpu.optim.factory import create_optimizer
    from unite_tpu.train.run_stage2 import load_finetune_ckpt
    from unite_tpu.train.train_state import TrainState

    ours = VisionTransformer(
        img_size=S, patch_size=16, num_classes=NC, embed_dim=48, depth=DEPTH,
        num_heads=2, mlp_ratio=4, qkv_bias=True, all_frames=T,
        tubelet_size=1, use_mean_pooling=True, norm_eps=1e-5,
    )

    class A:
        finetune = str(pth)
        model_key = "model|module"
        nb_classes = NC
        delete_head = False
        input_size = S
        patch_size = 16
        num_frames = T
        tubelet_size = 1
        use_mean_pooling = True

    params = ours.init(jax.random.PRNGKey(0),
                       jnp.asarray(vids[0]))["params"]
    params = load_finetune_ckpt(A, ours, params)
    tx, _ = create_optimizer(
        "adamw", lr=lr_tab, params=params, weight_decay=0.05,
        betas=(0.9, 0.999), eps=1e-8, num_layers=DEPTH, layer_decay=0.65,
    )
    tx = optax.MultiSteps(tx, every_k_schedule=UPDATE_FREQ)
    state = TrainState.create(params, tx, ema_decay=DECAY)
    step = jax.jit(make_finetune_train_step(ours, ema_decay=DECAY))
    our_losses = []
    for i in range(MICRO):
        batch = {"videos": jnp.asarray(mixed[i]),
                 "labels": jnp.asarray(labels[i], dtype=jnp.int32),
                 "soft_targets": jnp.asarray(soft[i])}
        state, m = step(state, batch, jax.random.PRNGKey(0))
        our_losses.append(float(m["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, atol=5e-4, rtol=2e-3)

    # EMA functional probe: identical eval forwards from the EMA weights
    probe = rh.bf16_representable(
        rng.normal(size=(2, T, S, S, 3)).astype(np.float32) * 0.5)
    ema.ema.eval()
    with torch.no_grad():
        ref_logits = ema.ema(_to_torch_video(probe)).numpy()
    ref_probs = np.exp(ref_logits - ref_logits.max(-1, keepdims=True))
    ref_probs /= ref_probs.sum(-1, keepdims=True)
    out = make_eval_step(ours, use_ema=True)(
        state, {"videos": jnp.asarray(probe),
                "labels": jnp.zeros((2,), jnp.int32)})
    np.testing.assert_allclose(np.asarray(out["probs"]), ref_probs,
                               atol=5e-4)


class _FixedTeacher(torch.nn.Module):
    """Stage-3 teacher stub: returns precomputed (norm_clip, attn) per call
    so BOTH frameworks consume bit-identical attention (the real teachers'
    parity is golden-tested; stage 3 only uses attn for committee masks)."""

    def __init__(self, attns):
        super().__init__()
        self.attns = [torch.tensor(a) for a in attns]
        self.calls = 0

    def forward(self, clip_videos):
        a = self.attns[self.calls]
        self.calls += 1
        bt = a.shape[0]
        return torch.zeros(1, bt // T, T * N_PF, 24), a


@pytest.mark.parametrize("strategy", ["clip_matchORconf", "consORconf"])
def test_stage3_engine_selection_and_loss_parity(tmp_path, strategy):
    """12 steps of the reference stage-3 loop (source CE + full/committee
    student passes + selection + confidence-weighted pseudo-label CE) vs
    our jitted selftrain step.  Teacher attention and CLIP zero-shot
    similarities are injected identically on both sides; asserts the loss
    curve AND the per-step selection diagnostics (sel_ratio,
    precision/recall, match/conf rates) match.  consORconf exercises the
    committee VOTE path, which runs as a separate stop-gradient forward in
    our step (engines/selftrain.py grad/vote split)."""
    rs3 = rh.import_ref("run_stage3")
    ru = rh.import_ref("src.utils")
    rof = rh.import_ref("src.optim_factory")
    _, ma, _ = _ref_modules()
    rh.install_shims()

    STEPS, B_S, B_T, NC = 12, 2, 2, 5
    ref_student, student, sp = _make_tiny_pair(tmp_path, ma,
                                               clip_return_layers=(1,),
                                               seed=7)
    torch.manual_seed(11)
    ref_head = torch.nn.Linear(48, NC)

    rng = np.random.default_rng(9)
    vids_s = rh.bf16_representable(
        rng.normal(size=(STEPS, B_S, T, S, S, 3)).astype(np.float32) * 0.5)
    vids_t = rh.bf16_representable(
        rng.normal(size=(5, B_T, T, S, S, 3)).astype(np.float32) * 0.5)
    vids_t_aug = rh.bf16_representable(
        rng.normal(size=(5, B_T, T, S, S, 3)).astype(np.float32) * 0.5)
    labels_s = rng.integers(0, NC, size=(STEPS, B_S))
    labels_t = rng.integers(0, NC, size=(5, B_T))
    attns = rng.uniform(0.01, 1.0, size=(STEPS, B_T * T, N_PF)).astype(
        np.float32)
    attns /= attns.sum(-1, keepdims=True)
    # CLIP zero-shot similarities: valid softmax rows, some confident
    clip_sims = rng.dirichlet(np.full(NC, 0.5),
                              size=(STEPS, B_T)).astype(np.float32)

    # ---- reference run ------------------------------------------------
    args = types.SimpleNamespace(
        log_freq=1, epochs=1, selection_strategy=strategy,
        return_aug_for_val=True, masking_type="clip_attention",
        use_cls_token=False, nb_classes=NC, clip_threshold=0.1,
        train_masked=True, conf_weighted_loss=True,
        class_loss_tgt_ratio=1.0, class_loss_src_ratio=1.0,
        class_loss_src_ratio_pl=1.0, full_oracle=False,
    )
    src_loader = [(_to_torch_video(vids_s[i]),
                   torch.tensor(labels_s[i], dtype=torch.long))
                  for i in range(STEPS)]
    tgt_loader = [(_to_torch_video(vids_t[i]), _to_torch_video(vids_t_aug[i]),
                   torch.tensor(labels_t[i], dtype=torch.long))
                  for i in range(5)]
    opt = rof.create_optimizer(_opt_args(lr=1e-3), ref_student,
                               skip_list=ref_student.no_weight_decay())
    ref_teacher = _FixedTeacher(attns)

    sim_queue = [torch.tensor(s) for s in clip_sims]
    calls = {"n": 0}

    def fake_setup_clip(a, device):
        return object(), None

    def fake_clip_infer(clip_model, videos, text_features):
        out = sim_queue[calls["n"]]
        calls["n"] += 1
        return out

    orig_setup, orig_infer = ru.setup_clip, ru.clip_infer
    ru.setup_clip, ru.clip_infer = fake_setup_clip, fake_clip_infer
    rh.wandb_records().clear()
    try:
        with rh.MeterTap(ru) as tap:
            rs3.train_one_epoch(
                rh.FakeDDP(ref_student), src_loader, tgt_loader, opt,
                torch.device("cpu"), 0, rh.make_native_scaler(), None,
                start_steps=0, lr_schedule_values=None,
                wd_schedule_values=None, src_classifier=ref_head,
                teacher_model=ref_teacher, clip_input_resolution=S,
                mask_type="attention", mask_ratio=MASK_RATIO,
                use_wandb=True, args=args,
            )
    finally:
        ru.setup_clip, ru.clip_infer = orig_setup, orig_infer
    ref_losses = tap.taps["loss"]
    ref_loss_t = tap.taps["loss_class_t"]
    assert len(ref_losses) == STEPS
    wb = rh.wandb_records()
    ref_sel = [r["train/select_ratio"] for r in wb]
    ref_prec = [r["train/correct_precision"] for r in wb]
    ref_rec = [r["train/correct_recall"] for r in wb]
    ref_match = [r["train/match_select_rate"] for r in wb]
    ref_conf = [r["train/conf_select_rate"] for r in wb]
    assert len(ref_sel) == STEPS

    # ---- our run ------------------------------------------------------
    import flax.linen as nn

    from unite_tpu.engines.selftrain import make_selftrain_step
    from unite_tpu.optim.factory import create_optimizer
    from unite_tpu.train.train_state import TrainState

    classifier = nn.Dense(NC, param_dtype=jnp.float32, dtype=jnp.float32)
    hp = {"kernel": jnp.asarray(ref_head.weight.detach().numpy().T),
          "bias": jnp.asarray(ref_head.bias.detach().numpy())}
    params = {"model": sp, "classifier": hp}
    # reference stage-3 optimizer covers the encoder only (run_stage3.py:
    # 1264) — the head is frozen; mirror via trainable_mask
    tmask = {"model": jax.tree.map(lambda _: True, sp),
             "classifier": jax.tree.map(lambda _: False, hp)}
    tx, _ = create_optimizer("adamw", lr=1e-3, params=params,
                             weight_decay=0.05, betas=(0.9, 0.999),
                             eps=1e-8, trainable_mask=tmask)
    state = TrainState.create(params, tx)
    step = jax.jit(make_selftrain_step(
        student, classifier, None, num_patches=N_PATCH, frames=T,
        mask_ratio=MASK_RATIO, selection_strategy=strategy,
        clip_threshold=0.1, conf_weighted_loss=True, train_masked=True,
        use_cls_token=False, nb_classes=NC, clip_input_resolution=S,
    ))
    keys = ["loss", "loss_class_t", "sel_ratio",
            "correct_precision", "correct_recall"]
    if strategy == "clip_matchORconf":
        keys += ["match_select_rate", "conf_select_rate"]
    ours = {k: [] for k in keys}
    for i in range(STEPS):
        batch = {
            "videos_s": jnp.asarray(vids_s[i]),
            "labels_s": jnp.asarray(labels_s[i], dtype=jnp.int32),
            "videos_t": jnp.asarray(vids_t[i % 5]),
            "videos_t_aug": jnp.asarray(vids_t_aug[i % 5]),
            "labels_t": jnp.asarray(labels_t[i % 5], dtype=jnp.int32),
            "clip_sim": jnp.asarray(clip_sims[i]),
            "attn": jnp.asarray(attns[i]),
        }
        state, m = step(state, None, batch, jax.random.PRNGKey(0))
        for k in ours:
            ours[k].append(float(m[k]))

    np.testing.assert_allclose(ours["loss"], ref_losses, atol=5e-4, rtol=2e-3)
    np.testing.assert_allclose(ours["loss_class_t"], ref_loss_t,
                               atol=5e-4, rtol=2e-3)
    # selection DECISIONS must match exactly (counts are discrete)
    np.testing.assert_allclose(ours["sel_ratio"], ref_sel, atol=1e-6)
    if strategy == "clip_matchORconf":
        np.testing.assert_allclose(ours["match_select_rate"], ref_match,
                                   atol=1e-6)
        np.testing.assert_allclose(ours["conf_select_rate"], ref_conf,
                                   atol=1e-6)
    # precision is 0/0 = nan in the reference when nothing is selected
    # (run_stage3.py:595); ours defines it as 0 — compare where finite and
    # require the nan positions to be exactly the zero-selection steps
    ref_prec = np.asarray(ref_prec)
    finite = np.isfinite(ref_prec)
    np.testing.assert_array_equal(~finite, np.asarray(ref_sel) == 0.0)
    np.testing.assert_allclose(np.asarray(ours["correct_precision"])[finite],
                               ref_prec[finite], atol=1e-6)
    # recall is likewise 0/0 = nan in the reference when NO target
    # prediction is correct (run_stage3.py:596); ours defines it as 0
    ref_rec = np.asarray(ref_rec)
    finite_r = np.isfinite(ref_rec)
    np.testing.assert_allclose(np.asarray(ours["correct_recall"])[finite_r],
                               ref_rec[finite_r], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours["correct_recall"])[~finite_r],
                               0.0, atol=1e-6)


# --- eval protocol: validation + final_test + merge --------------------------


def test_stage2_eval_protocol_parity(tmp_path, monkeypatch):
    """Executes the reference's OWN eval code — validation_one_epoch
    (engine_for_finetuning.py:175-237), final_test (:241-299) and merge
    (:302-351) — against run_validation / run_final_test / merge on
    identical weights and identical multi-view batches, closing the eval
    half of the pipeline-parity chain (the train halves are above).

    Non-mathematical harness patches, reference side only: dist stubbed to
    world-size-1 no-ops (validation_one_epoch calls dist.barrier/all_gather
    UNCONDITIONALLY — single-process mode is unsupported as shipped, SURVEY
    §4); np.float = float (merge pins numpy<1.24, SURVEY §2.1); the 64-proc
    merge Pool replaced by serial map (identical semantics)."""
    eff = rh.import_ref("src.engines.engine_for_finetuning")
    mf, _, _ = _ref_modules()
    rh.install_shims()

    NC, DEPTH = 7, 2
    torch.manual_seed(9)
    ref = mf.VisionTransformer(
        img_size=S, patch_size=16, num_classes=NC, embed_dim=48, depth=DEPTH,
        num_heads=2, mlp_ratio=4, qkv_bias=True, all_frames=T,
        tubelet_size=1, use_mean_pooling=True, init_scale=1.0,
    ).eval()
    pth = tmp_path / "ref_vit_eval.pth"
    torch.save({"model": ref.state_dict()}, pth)

    from unite_tpu.models.vit import VisionTransformer
    from unite_tpu.train.run_stage2 import load_finetune_ckpt

    ours = VisionTransformer(
        img_size=S, patch_size=16, num_classes=NC, embed_dim=48, depth=DEPTH,
        num_heads=2, mlp_ratio=4, qkv_bias=True, all_frames=T,
        tubelet_size=1, use_mean_pooling=True, norm_eps=1e-5,
    )

    class A:
        finetune = str(pth)
        model_key = "model|module"
        nb_classes = NC
        delete_head = False
        input_size = S
        patch_size = 16
        num_frames = T
        tubelet_size = 1
        use_mean_pooling = True
        num_workers = 1

    params = ours.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, T, S, S, 3), jnp.float32))["params"]
    params = load_finetune_ckpt(A, ours, params)

    # identical multi-view data: 6 videos x (2 chunks x 3 crops)
    rng = np.random.default_rng(11)
    NVID, NCHUNK, NCROP = 6, 2, 3
    labels_per_vid = rng.integers(0, NC, NVID)
    views = [
        (f"vid{v}",
         rh.bf16_representable(
             rng.normal(size=(T, S, S, 3)).astype(np.float32) * 0.5),
         int(labels_per_vid[v]), ck, cp)
        for v in range(NVID) for ck in range(NCHUNK) for cp in range(NCROP)
    ]

    class _Dist:  # world-size-1 collectives (reference side)
        @staticmethod
        def barrier():
            pass

        @staticmethod
        def all_gather(out, t):
            out[0].copy_(t)

    monkeypatch.setattr(eff, "dist", _Dist)

    from unite_tpu.engines.finetune import make_eval_step
    from unite_tpu.engines.finetune import merge as our_merge
    from unite_tpu.parallel.mesh import make_mesh
    from unite_tpu.train import common

    state = types.SimpleNamespace(params=params, ema_params=None)
    eval_step = make_eval_step(ours)
    mesh = make_mesh()

    # ---- validation: single-view subset (chunk 0, crop 0), batches of 3 --
    val_items = [x for x in views if x[3] == 0 and x[4] == 0]
    ref_loader = [
        (_to_torch_video(np.stack([x[1] for x in val_items[i:i + 3]])),
         torch.tensor([x[2] for x in val_items[i:i + 3]], dtype=torch.long))
        for i in range(0, len(val_items), 3)
    ]
    ref_stats, ref_ece = eff.validation_one_epoch(
        ref_loader, ref, torch.device("cpu"),
        save_preds_path=str(tmp_path / "ref_preds"))

    our_loader = [
        (np.stack([x[1] for x in val_items[i:i + 3]]),
         np.asarray([x[2] for x in val_items[i:i + 3]]))
        for i in range(0, len(val_items), 3)
    ]
    our_stats = common.run_validation(
        state, eval_step, our_loader, mesh, batch_size=1,
        save_preds_path=str(tmp_path / "our_preds"))

    np.testing.assert_allclose(our_stats["acc1"], ref_stats["acc1"],
                               atol=1e-9)
    np.testing.assert_allclose(our_stats["acc5"], ref_stats["acc5"],
                               atol=1e-9)
    np.testing.assert_allclose(our_stats["loss"], ref_stats["loss"],
                               atol=5e-4, rtol=2e-3)
    np.testing.assert_allclose(our_stats["ece"], ref_ece, atol=5e-4)
    np.testing.assert_array_equal(
        np.load(tmp_path / "our_preds" / "preds.npy"),
        np.load(tmp_path / "ref_preds" / "preds.npy"))
    np.testing.assert_array_equal(
        np.load(tmp_path / "our_preds" / "labels.npy"),
        np.load(tmp_path / "ref_preds" / "labels.npy"))

    # ---- final_test + merge: all 36 views, batches of 6 ------------------
    ref_dir = tmp_path / "ref_test"
    ref_dir.mkdir()
    (ref_dir / "0.txt").touch()  # dodge os.mknod on exotic filesystems
    ref_test_loader = [
        (_to_torch_video(np.stack([x[1] for x in views[i:i + 6]])),
         torch.tensor([x[2] for x in views[i:i + 6]], dtype=torch.long),
         [x[0] for x in views[i:i + 6]],
         torch.tensor([x[3] for x in views[i:i + 6]]),
         torch.tensor([x[4] for x in views[i:i + 6]]))
        for i in range(0, len(views), 6)
    ]
    eff.final_test(ref_test_loader, ref, torch.device("cpu"),
                   str(ref_dir / "0.txt"))

    class _FakePool:  # serial stand-in for merge's Pool(64)
        def __init__(self, n):
            pass

        def map(self, fn, xs):
            return list(map(fn, xs))

    import multiprocessing

    monkeypatch.setattr(multiprocessing, "Pool", _FakePool)
    monkeypatch.setattr(np, "float", float, raising=False)
    ref_top1, ref_top5 = eff.merge(str(ref_dir), 1)

    class _ViewDataset:
        def __len__(self):
            return len(views)

        def __getitem__(self, i):
            vid, clip, label, ck, cp = views[i]
            return clip, label, vid, ck, cp

    our_dir = tmp_path / "our_test"
    our_dir.mkdir()
    common.run_final_test(state, eval_step, _ViewDataset(), A, mesh,
                          batch_size=1, output_dir=str(our_dir))
    our_top1, our_top5 = our_merge(str(our_dir), 1)

    np.testing.assert_allclose(our_top1, ref_top1, atol=1e-9)
    np.testing.assert_allclose(our_top5, ref_top5, atol=1e-9)
