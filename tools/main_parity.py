"""Main-vs-main parity: run the REFERENCE's run_stage2.main() and our
run_stage2.main() end to end on identical synthetic batches and compare
their per-epoch log.txt records (VERDICT r4 item 2).

The engine loops are already pinned side by side
(tests/test_engine_e2e_parity.py); what was never compared is the ENTRY
GLUE around them — schedule construction + per-step LR/WD writes
(reference run_stage2.py:651-675), EMA/update_freq ordering inside a real
epoch loop (engine_for_finetuning.py:104-124), val/best-checkpoint/
final-test/merge cadence (:783-847), and auto-resume (utils.py:739-776,
exercised by the --resume_check phase).

Controlled variables:
* data: both build_dataset's are monkeypatched to fixed synthetic arrays
  (fp32, already normalized) — no decode, no augmentation randomness;
* sample order: our ShardedSampler.indices is patched to the torch
  randperm order the reference's sampler draws; the reference's
  single-process run never calls set_epoch (run_stage2.py:755 gates it on
  args.distributed), so the patch reproduces exactly that epoch-0 order
  every epoch;
* weights: the reference model's torch init is saved and --finetune'd
  into both runs (our side through the tested torch importer);
* numerics: our entry runs with --compute_dtype float32; the reference's
  CUDA GradScaler self-disables on CPU (fp32, scale=1).

Usage:
  python tools/main_parity.py [--epochs 2] [--resume_check] [--json OUT]
Run from the repo root on CPU (the test suite conftest is not involved;
pass JAX_PLATFORMS=cpu).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, REPO)

# the reference saves numpy scalars inside its checkpoints (max_accuracy);
# torch>=2.6 weights_only torch.load (utils.py:766) rejects them by default
try:
    torch.serialization.add_safe_globals(
        [np._core.multiarray.scalar, np.dtype, np.dtypes.Float64DType,
         argparse.Namespace])
except Exception:
    pass

NC, B, T, S = 5, 4, 4, 32
N_TRAIN, N_VAL, N_TEST = 32, 16, 8


def make_data():
    rng = np.random.default_rng(11)

    def clips(n, seed_off):
        r = np.random.default_rng(100 + seed_off)
        x = r.normal(size=(n, T, S, S, 3)).astype(np.float32) * 0.5
        # keep values exactly representable in bf16 so a bf16 cross-check
        # run stays comparable (fp32 runs are unaffected)
        import ref_harness as rh

        return rh.bf16_representable(x)

    return {
        "train": (clips(N_TRAIN, 0),
                  rng.integers(0, NC, size=N_TRAIN).astype(np.int64)),
        "val": (clips(N_VAL, 1),
                rng.integers(0, NC, size=N_VAL).astype(np.int64)),
        "test": (clips(N_TEST, 2),
                 rng.integers(0, NC, size=N_TEST).astype(np.int64)),
    }


# --------------------------------------------------------------------------
# reference side
# --------------------------------------------------------------------------


def run_reference(data, out_dir, ckpt_path, epochs, make_ckpt=False):
    import ref_harness as rh

    rh.install_shims()
    rs2 = rh.import_ref("run_stage2")
    # numpy>=1.24 removed the deprecated builtin aliases the reference's
    # merge() uses (engine_for_finetuning.py:317 np.float); restore the
    # exact old semantics (alias of the builtin)
    for name, alias in (("float", float), ("int", int), ("bool", bool)):
        if not hasattr(np, name):
            setattr(np, name, alias)
    import importlib

    mf = importlib.import_module("src.models.modeling_finetune")

    import inspect

    vt_keys = set(inspect.signature(mf.VisionTransformer).parameters)

    if "vit_parity_tiny" not in rh._MODEL_REGISTRY:
        def vit_parity_tiny(pretrained=False, **kw):
            kw = {k: v for k, v in kw.items() if k in vt_keys}
            return mf.VisionTransformer(
                img_size=S, patch_size=16, embed_dim=48, depth=2,
                num_heads=2, mlp_ratio=4, qkv_bias=True, **kw)
        rh._MODEL_REGISTRY["vit_parity_tiny"] = vit_parity_tiny

    if make_ckpt:
        torch.manual_seed(7)
        ref_model = rh._MODEL_REGISTRY["vit_parity_tiny"](
            num_classes=NC, all_frames=T, tubelet_size=1,
            use_mean_pooling=True, init_scale=0.001)
        torch.save({"model": ref_model.state_dict()}, ckpt_path)

    # a REAL (gloo, world=1) default group: validation_one_epoch's
    # dist.all_gather (engine_for_finetuning.py:213) and the barrier after
    # final_test are unconditional. The meters' synchronize_between_
    # processes hardcodes device='cuda' (utils.py:239) — patched to the
    # same [count,total] all-reduce on CPU tensors (identity at world=1).
    if not torch.distributed.is_initialized():
        torch.distributed.init_process_group(
            "gloo", init_method="tcp://127.0.0.1:29511", rank=0,
            world_size=1)
    import importlib as _il

    ru = _il.import_module("src.utils")

    def _sync_cpu(self):
        if not ru.is_dist_avail_and_initialized():
            return
        t = torch.tensor([self.count, self.total], dtype=torch.float64)
        torch.distributed.barrier()
        torch.distributed.all_reduce(t)
        t = t.tolist()
        self.count = int(t[0])
        self.total = t[1]

    ru.SmoothedValue.synchronize_between_processes = _sync_cpu

    class RefTrain(torch.utils.data.Dataset):
        def __len__(self):
            return N_TRAIN

        def __getitem__(self, i):
            clip = torch.from_numpy(
                data["train"][0][i].transpose(3, 0, 1, 2))  # [C,T,H,W]
            return clip, int(data["train"][1][i]), i, {}

    class RefVal(torch.utils.data.Dataset):
        def __len__(self):
            return N_VAL

        def __getitem__(self, i):
            clip = torch.from_numpy(data["val"][0][i].transpose(3, 0, 1, 2))
            return clip, int(data["val"][1][i])

    class RefTest(torch.utils.data.Dataset):
        def __len__(self):
            return N_TEST

        def __getitem__(self, i):
            clip = torch.from_numpy(data["test"][0][i].transpose(3, 0, 1, 2))
            return clip, int(data["test"][1][i]), f"v{i}", 0, 0

    def fake_build_dataset(is_train, test_mode, args):
        if is_train:
            return RefTrain(), NC
        return (RefTest() if test_mode else RefVal()), NC

    real_loader = torch.utils.data.DataLoader

    def loader_no_workers(*a, **k):
        k.pop("persistent_workers", None)  # needs num_workers > 0
        k["num_workers"] = 0
        k.pop("pin_memory", None)
        return real_loader(*a, **k)

    class CPUSafeScaler(rs2.NativeScaler):
        def state_dict(self):
            sd = super().state_dict()
            return sd if sd else {"scale": 1.0}

    saved = {n: getattr(rs2, n) for n in ("build_dataset", "NativeScaler")}
    rs2.build_dataset = fake_build_dataset
    rs2.NativeScaler = CPUSafeScaler
    saved_dl = torch.utils.data.DataLoader
    torch.utils.data.DataLoader = loader_no_workers
    try:
        argv = [
            "--model", "vit_parity_tiny", "--batch_size", str(B),
            "--epochs", str(epochs), "--update_freq", "2",
            "--lr", "5e-4", "--min_lr", "1e-6", "--warmup_lr", "1e-6",
            "--warmup_epochs", "1", "--layer_decay", "0.65",
            "--weight_decay", "0.05", "--smoothing", "0.1",
            "--model_ema", "--model_ema_decay", "0.9",
            "--no_delete_head", "--dist_eval", "--test_best",
            "--use_mean_pooling",
            "--input_size", str(S), "--num_frames", str(T),
            "--num_segments", "1", "--tubelet_size", "1",
            "--drop_path", "0", "--finetune", ckpt_path,
            "--output_dir", out_dir, "--device", "cpu",
            "--num_workers", "0", "--test_num_segment", "1",
            "--test_num_crop", "1", "--seed", "0", "--eval_freq", "1",
            "--disable_wandb", "--num_sample", "1",
            "--mixup", "0", "--cutmix", "0", "--mixup_prob", "0",
        ]
        # get_args ignores its parameter past parse_known_args — the final
        # parse reads sys.argv (reference run_stage2.py:289)
        old_argv = sys.argv
        sys.argv = ["run_stage2.py"] + argv
        try:
            got = rs2.get_args()
        finally:
            sys.argv = old_argv
        args = got[0] if isinstance(got, tuple) else got
        ds_init = got[1] if isinstance(got, tuple) and len(got) > 1 else None
        rs2.main(args, ds_init)
    finally:
        for n, v in saved.items():
            setattr(rs2, n, v)
        torch.utils.data.DataLoader = saved_dl
    return read_log(out_dir)


# --------------------------------------------------------------------------
# our side
# --------------------------------------------------------------------------


def run_ours(data, out_dir, ckpt_path, epochs):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from unite_tpu.data.sharding import ShardedSampler
    from unite_tpu.models.vit import VisionTransformer
    from unite_tpu.utils.registry import _MODEL_REGISTRY, register_model

    if "vit_parity_tiny" not in _MODEL_REGISTRY:
        @register_model
        def vit_parity_tiny(**kw):
            import inspect

            keys = set(inspect.signature(VisionTransformer).parameters)
            kw = {k: v for k, v in kw.items() if k in keys}
            return VisionTransformer(
                img_size=S, patch_size=16, embed_dim=48, depth=2,
                num_heads=2, mlp_ratio=4, qkv_bias=True, norm_eps=1e-5,
                **kw)

    class OursTrain:
        def __len__(self):
            return N_TRAIN

        def __getitem__(self, i):
            return data["train"][0][i], int(data["train"][1][i]), i, {}

    class OursVal:
        def __len__(self):
            return N_VAL

        def __getitem__(self, i):
            return data["val"][0][i], int(data["val"][1][i])

    class OursTest:
        def __len__(self):
            return N_TEST

        def __getitem__(self, i):
            return data["test"][0][i], int(data["test"][1][i]), f"v{i}", 0, 0

    def fake_build_dataset(mode, args, anno_path=None, reader=None):
        if mode == "train":
            return OursTrain(), NC
        return (OursTest() if mode == "test" else OursVal()), NC

    # the reference's single-process sampler order: torch randperm with
    # g.manual_seed(seed + epoch), epoch frozen at 0 because its
    # set_epoch call is gated on args.distributed (run_stage2.py:755)
    def torch_order_indices(self):
        g = torch.Generator()
        g.manual_seed(self.seed * 0 + 0)
        order = []
        for _ in range(self.repetitions):
            order.extend(torch.randperm(self.dataset_len,
                                        generator=g).tolist())
        if not self.drop_last:
            pad = self.total_size - len(order)
            if pad > 0:
                order += order[:pad]
        else:
            order = order[:self.total_size]
        return order[self.shard_id:self.total_size:self.num_shards]

    import unite_tpu.train.run_stage2 as ours2
    from unite_tpu.config import parse_with_config
    from unite_tpu.train.args import stage2_parser

    saved_bd = ours2.build_dataset
    saved_idx = ShardedSampler.indices
    ours2.build_dataset = fake_build_dataset
    ShardedSampler.indices = torch_order_indices
    try:
        args = parse_with_config(stage2_parser(), [
            "--model", "vit_parity_tiny", "--batch_size", str(B),
            "--batch_size_val", str(2 * B),
            "--epochs", str(epochs), "--update_freq", "2",
            "--lr", "5e-4", "--min_lr", "1e-6", "--warmup_lr", "1e-6",
            "--warmup_epochs", "1", "--layer_decay", "0.65",
            "--weight_decay", "0.05", "--smoothing", "0.1",
            "--model_ema", "true", "--model_ema_decay", "0.9",
            "--delete_head", "false", "--test_best", "true",
            "--input_size", str(S), "--num_frames", str(T),
            "--num_segments", "1", "--tubelet_size", "1",
            "--drop_path", "0", "--finetune", ckpt_path,
            "--output_dir", out_dir, "--num_workers", "1",
            "--test_num_segment", "1", "--test_num_crop", "1",
            "--seed", "0", "--eval_freq", "1", "--nb_classes", str(NC),
            "--log_freq", "1",  # sync every step: epoch train stats then
            # average ALL steps, same population as the reference meters
            # (our async loop otherwise averages only logged windows)
            "--compute_dtype", "float32", "--overwrite", "resume",
        ])
        ours2.main(args)
    finally:
        ours2.build_dataset = saved_bd
        ShardedSampler.indices = saved_idx
    return read_log(out_dir)


# --------------------------------------------------------------------------


def read_log(out_dir):
    recs = []
    with open(os.path.join(out_dir, "log.txt")) as f:
        for line in f:
            recs.append(json.loads(line))
    return recs


def compare(ref, ours, label):
    """Align per-epoch records and the final-test record; return deltas."""
    ref_ep = {r["epoch"]: r for r in ref if "epoch" in r}
    our_ep = {r["epoch"]: r for r in ours if "epoch" in r}
    ref_fin = next((r for r in ref if "Final top-1" in r), None)
    our_fin = next((r for r in reversed(ours) if "test_acc1" in r), None)
    rows, max_rel = [], 0.0
    for ep in sorted(ref_ep):
        assert ep in our_ep, f"epoch {ep} missing on our side"
        for rk, ok in [("train_loss", "train_loss"),
                       ("train_class_acc", "train_class_acc"),
                       ("val_acc1", "val_acc1"), ("val_acc5", "val_acc5"),
                       ("val_loss", "val_loss")]:
            if rk not in ref_ep[ep]:
                continue
            a, b = float(ref_ep[ep][rk]), float(our_ep[ep][ok])
            rel = abs(a - b) / max(abs(a), 1e-9)
            max_rel = max(max_rel, rel)
            rows.append((f"ep{ep}.{rk}", a, b, rel))
    if ref_fin is not None and our_fin is not None:
        for rk, ok in [("Final top-1", "test_acc1"),
                       ("Final Top-5", "test_acc5")]:
            a, b = float(ref_fin[rk]), float(our_fin[ok])
            rel = abs(a - b) / max(abs(a), 1e-9)
            max_rel = max(max_rel, rel)
            rows.append((f"final.{rk}", a, b, rel))
    print(f"\n== {label} ==")
    print(f"{'key':24s} {'reference':>12s} {'ours':>12s} {'rel':>10s}")
    for k, a, b, rel in rows:
        print(f"{k:24s} {a:12.6f} {b:12.6f} {rel:10.2e}")
    print(f"max rel delta: {max_rel:.3e}")
    return rows, max_rel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--resume_check", action="store_true",
                    help="after the fresh run, re-invoke both mains with "
                         "2x epochs on the same output dirs (auto-resume "
                         "glue, reference utils.py:739-776)")
    ap.add_argument("--json", default=os.path.join(REPO,
                                                   "MAIN_PARITY_r05.json"))
    a = ap.parse_args()

    work = tempfile.mkdtemp(prefix="main_parity_")
    ref_dir = os.path.join(work, "ref_scrap")  # 'scrap' => ref wandb off
    our_dir = os.path.join(work, "ours")
    os.makedirs(ref_dir), os.makedirs(our_dir)
    ckpt = os.path.join(work, "init.pth")
    data = make_data()

    ref_log = run_reference(data, ref_dir, ckpt, a.epochs, make_ckpt=True)
    our_log = run_ours(data, our_dir, ckpt, a.epochs)
    rows, max_rel = compare(ref_log, our_log, f"fresh {a.epochs} epochs")
    out = {"fresh": {"rows": rows, "max_rel": max_rel,
                     "epochs": a.epochs}}

    if a.resume_check:
        ref_log = run_reference(data, ref_dir, ckpt, 2 * a.epochs)
        our_log = run_ours(data, our_dir, ckpt, 2 * a.epochs)
        rows, max_rel = compare(ref_log, our_log,
                                f"resumed to {2 * a.epochs} epochs")
        out["resumed"] = {"rows": rows, "max_rel": max_rel,
                          "epochs": 2 * a.epochs}

    with open(a.json, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {a.json}")
    worst = max(v["max_rel"] for v in out.values())
    if worst > 2e-3:
        print(f"PARITY FAIL: max rel delta {worst:.3e} > 2e-3")
        sys.exit(1)
    print("PARITY OK")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
