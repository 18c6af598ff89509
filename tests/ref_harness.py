"""Import-and-RUN harness for the reference's actual engine code.

The end-to-end parity tests (test_engine_e2e_parity.py) must execute the
reference's *own* train loops (/root/reference/run_stage1.py:294-505,
src/engines/engine_for_finetuning.py:48-171, run_stage3.py:340-710) — not a
reimplementation — side by side with unite_tpu's engines. The reference
targets a 2022 CUDA environment; this module installs just enough stub
surface for those modules to import on this image:

* ``timm`` (models registry/layers shims as in test_golden_reference, plus
  utils/loss/optim/data submodules),
* ``torch._six`` (removed in torch>=2; only ``inf`` is used),
* ``decord`` / ``wandb`` / ``clip`` / ``prettytable`` / ``torchvision`` /
  ``numpy.lib.function_base`` (absent from the image; any stub that is
  *exercised* raises, except the recording ``wandb.log``),
* ``src.knn`` (missing from the reference itself — SURVEY §2.1 known
  defect; stubbed with our ECE so the engines can import).

Two behavior patches, both non-mathematical:
* ``torch.cuda.synchronize`` → no-op when CUDA is unavailable (pure sync);
* ``MetricLogger.log_every`` → plain pass-through generator (the reference's
  console formatter KeyErrors on non-CUDA hosts: its format string includes
  ``{total_eta}`` that the non-CUDA print branch never supplies,
  utils.py:323-357). Metric VALUES still flow through ``update`` untouched,
  and the harness records them per step for the parity assertions.
"""

from __future__ import annotations

import importlib
import importlib.machinery
import sys
import types

import numpy as np
import torch

REF = "/root/reference"

_MODEL_REGISTRY: dict = {}


def _mod(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return m


def _raising_getattr(modname):
    def __getattr__(attr):  # PEP 562 module __getattr__
        if attr.startswith("__"):  # import machinery probes (__path__, ...)
            raise AttributeError(attr)
        raise RuntimeError(
            f"reference harness stub {modname!r} was exercised "
            f"(attribute {attr!r}); the parity tests must not reach it")
    return __getattr__


def _ensure(name: str) -> types.ModuleType:
    if name not in sys.modules:
        sys.modules[name] = _mod(name)
    return sys.modules[name]


def _install_timm():
    timm = _ensure("timm")
    models = _ensure("timm.models")
    registry = _ensure("timm.models.registry")
    layers = _ensure("timm.models.layers")
    timm.models = models
    models.registry = registry
    models.layers = layers

    if not hasattr(registry, "register_model"):
        def register_model(fn):
            _MODEL_REGISTRY[fn.__name__] = fn
            return fn
        registry.register_model = register_model

    if not hasattr(layers, "to_2tuple"):
        def to_2tuple(x):
            return x if isinstance(x, (tuple, list)) else (x, x)

        def drop_path(x, drop_prob=0.0, training=False):
            if drop_prob == 0.0 or not training:
                return x
            keep = 1.0 - drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            mask.floor_()
            return x.div(keep) * mask

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(a * std + mean, b * std + mean)
            return tensor

        layers.to_2tuple = to_2tuple
        layers.drop_path = drop_path
        layers.trunc_normal_ = trunc_normal_

    if not hasattr(models, "create_model"):
        def create_model(name, pretrained=False, **kwargs):
            if name in _MODEL_REGISTRY:
                return _MODEL_REGISTRY[name](pretrained=pretrained, **kwargs)
            raise RuntimeError(f"timm shim: unknown model {name!r}")
        models.create_model = create_model

    utils = _ensure("timm.utils")
    timm.utils = utils
    if not hasattr(utils, "accuracy"):
        def accuracy(output, target, topk=(1,)):
            maxk = max(topk)
            _, pred = output.topk(maxk, 1, True, True)
            pred = pred.t()
            correct = pred.eq(target.reshape(1, -1).expand_as(pred))
            return [correct[:k].reshape(-1).float().sum(0) * 100.0 /
                    target.size(0) for k in topk]
        utils.accuracy = accuracy
        utils.get_state_dict = lambda model, unwrap_fn=None: model.state_dict()

        class ModelEma:
            # faithful legacy timm ModelEma (timm/utils/model_ema.py) — the
            # class run_stage2.py:588-592 constructs; update() is the exact
            # state_dict formula the EMA-parity test matches against
            def __init__(self, model, decay=0.9999, device="", resume=""):
                import copy
                self.ema = copy.deepcopy(model)
                self.ema.eval()
                self.decay = decay
                for p in self.ema.parameters():
                    p.requires_grad_(False)

            def update(self, model):
                with torch.no_grad():
                    msd = model.state_dict()
                    for k, ema_v in self.ema.state_dict().items():
                        model_v = msd[k].detach()
                        ema_v.copy_(ema_v * self.decay
                                    + (1.0 - self.decay) * model_v)

            def state_dict(self):
                # legacy timm ModelEma proxies the shadow module's
                # state_dict (utils.get_state_dict(model_ema) at
                # save_latest_model, reference utils.py:729)
                return self.ema.state_dict()

            def _load_checkpoint(self, checkpoint_path):
                # legacy timm resume path: _load_checkpoint_for_ema wraps
                # the saved EMA weights as {'state_dict_ema': sd} in a
                # BytesIO (reference utils.py:458-464)
                ckpt = torch.load(checkpoint_path, map_location="cpu",
                                  weights_only=False)
                self.ema.load_state_dict(ckpt.get("state_dict_ema", ckpt))
        utils.ModelEma = ModelEma

    loss_mod = _ensure("timm.loss")
    timm.loss = loss_mod
    if not hasattr(loss_mod, "SoftTargetCrossEntropy"):
        # faithful timm formulas (timm/loss/cross_entropy.py) — these ARE
        # the stage-2 criterion semantics being matched (run_stage2.py:675)
        class LabelSmoothingCrossEntropy(torch.nn.Module):
            def __init__(self, smoothing=0.1):
                super().__init__()
                self.smoothing = smoothing
                self.confidence = 1.0 - smoothing

            def forward(self, x, target):
                logprobs = torch.nn.functional.log_softmax(x, dim=-1)
                nll = -logprobs.gather(dim=-1, index=target.unsqueeze(1))
                nll = nll.squeeze(1)
                smooth = -logprobs.mean(dim=-1)
                return (self.confidence * nll + self.smoothing * smooth).mean()

        class SoftTargetCrossEntropy(torch.nn.Module):
            def forward(self, x, target):
                loss = torch.sum(
                    -target * torch.nn.functional.log_softmax(x, dim=-1), dim=-1)
                return loss.mean()

        loss_mod.LabelSmoothingCrossEntropy = LabelSmoothingCrossEntropy
        loss_mod.SoftTargetCrossEntropy = SoftTargetCrossEntropy

    data_mod = _ensure("timm.data")
    constants = _ensure("timm.data.constants")
    timm.data = data_mod
    data_mod.constants = constants
    constants.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    constants.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)

    optim_pkg = _ensure("timm.optim")
    timm.optim = optim_pkg
    for sub, cls_names in {
        "adafactor": ["Adafactor"], "adahessian": ["Adahessian"],
        "adamp": ["AdamP"], "lookahead": ["Lookahead"], "nadam": ["Nadam"],
        "novograd": ["NovoGrad"], "nvnovograd": ["NvNovoGrad"],
        "radam": ["RAdam"], "rmsprop_tf": ["RMSpropTF"], "sgdp": ["SGDP"],
    }.items():
        m = _ensure(f"timm.optim.{sub}")
        setattr(optim_pkg, sub, m)
        for cls in cls_names:
            if not hasattr(m, cls):
                def _make(cname=cls):
                    class _Stub:
                        def __init__(self, *a, **k):
                            raise RuntimeError(
                                f"timm shim optimizer {cname} exercised")
                    _Stub.__name__ = cname
                    return _Stub
                setattr(m, cls, _make())


class _WandbRecorder:
    """Recording wandb stub: run_stage3's per-step selection diagnostics
    (sel_ratio, precision/recall, match/conf rates) reach ONLY wandb.log
    (run_stage3.py:676-703), so the parity tests read them from here."""

    def __init__(self):
        self.records = []

    def log(self, d, *a, **k):
        self.records.append({k2: (float(v) if hasattr(v, "__float__") else v)
                             for k2, v in d.items()})

    def init(self, *a, **k):
        return self

    def __getattr__(self, name):
        raise RuntimeError(f"wandb stub attribute {name!r} exercised")


def install_shims():
    """Idempotent: extends any shims already installed (e.g. by
    test_golden_reference's _install_timm_shim)."""
    _install_timm()

    if "torch._six" not in sys.modules:
        six = _mod("torch._six")
        six.inf = float("inf")
        sys.modules["torch._six"] = six

    if not hasattr(sys.modules.get("wandb"), "_recorder"):
        wandb = _mod("wandb")
        rec = _WandbRecorder()
        wandb.log = rec.log
        wandb.init = rec.init
        wandb._recorder = rec
        sys.modules["wandb"] = wandb

    if "decord" not in sys.modules:
        dec = _mod("decord")

        class VideoReader:
            def __init__(self, *a, **k):
                raise RuntimeError("decord stub exercised")

        dec.VideoReader = VideoReader
        dec.cpu = lambda *a, **k: None
        dec.__getattr__ = _raising_getattr("decord")
        sys.modules["decord"] = dec
    if "clip" not in sys.modules:
        m = _mod("clip")
        m.__getattr__ = _raising_getattr("clip")
        sys.modules["clip"] = m

    if "prettytable" not in sys.modules:
        pt = _mod("prettytable")

        class PrettyTable:
            def __init__(self, *a, **k):
                self.rows = []

            def add_row(self, row):
                self.rows.append(list(row))

            def add_column(self, name, col):
                for i, v in enumerate(col):
                    while len(self.rows) <= i:
                        self.rows.append([])
                    self.rows[i].append(v)

            def __str__(self):
                return "\n".join(" | ".join(map(str, r)) for r in self.rows)

        pt.PrettyTable = PrettyTable
        sys.modules["prettytable"] = pt

    if "torchvision" not in sys.modules:
        tv = _mod("torchvision")
        tvt = _mod("torchvision.transforms")
        tvf = _mod("torchvision.transforms.functional")
        for name, m in (("torchvision", tv), ("torchvision.transforms", tvt),
                        ("torchvision.transforms.functional", tvf)):
            m.__getattr__ = _raising_getattr(name)
            sys.modules[name] = m
        tv.transforms = tvt
        tvt.functional = tvf

    if "numpy.lib.function_base" not in sys.modules:
        fb = _mod("numpy.lib.function_base")
        fb.disp = print
        sys.modules["numpy.lib.function_base"] = fb

    # src.knn is missing from the reference repo itself (imported at
    # engine_for_finetuning.py:35, run_stage3.py:60 — SURVEY §2.1); provide
    # our ECE under the same name so the engines can import at all.
    if "src.knn" not in sys.modules:
        knn = _mod("src.knn")

        def compute_ece(probs, labels, n_bins=15):
            from unite_tpu.utils.metrics import compute_ece as _ece
            return _ece(np.asarray(probs), np.asarray(labels), n_bins)

        knn.compute_ece = compute_ece
        sys.modules["src.knn"] = knn

    if not torch.cuda.is_available():
        torch.cuda.synchronize = lambda *a, **k: None


def import_ref(module: str):
    """Import a reference module (``run_stage1``, ``src.utils``, ...) with
    shims installed and the logging-only patches applied."""
    install_shims()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    mod = importlib.import_module(module)
    ref_utils = importlib.import_module("src.utils")
    # console-logging patch only (see module docstring): values still flow
    # through MetricLogger.update and the meters

    def log_every(self, iterable, print_freq, n_epochs=None, curr_epoch=None,
                  ipe=None, header=None):
        for obj in iterable:
            yield obj

    ref_utils.MetricLogger.log_every = log_every
    return mod


class MeterTap:
    """Record every scalar passed to MetricLogger.update, per call order.

    ``taps["loss"]`` is the per-step loss sequence the reference loop logged
    (update(loss=...) is called exactly once per step)."""

    def __init__(self, ref_utils):
        self.taps: dict = {}
        self._utils = ref_utils
        self._orig = ref_utils.MetricLogger.update

    def __enter__(self):
        tap = self.taps
        orig = self._orig

        def update(self_ml, **kwargs):
            for k, v in kwargs.items():
                if v is None:
                    continue
                tap.setdefault(k, []).append(float(v))
            return orig(self_ml, **kwargs)

        self._utils.MetricLogger.update = update
        return self

    def __exit__(self, *exc):
        self._utils.MetricLogger.update = self._orig
        return False


class MultinomialTap:
    """Record torch.multinomial draws (the stage-1 attention-mask sampler,
    run_stage1.py:381-387) so the identical masks can be injected into the
    unite_tpu step via its ``vis_idx`` hook."""

    def __init__(self):
        self.draws = []
        self._orig = torch.multinomial

    def __enter__(self):
        orig = self._orig
        draws = self.draws

        def multinomial(input, num_samples, *a, **k):
            out = orig(input, num_samples, *a, **k)
            draws.append(out.detach().clone())
            return out

        torch.multinomial = multinomial
        return self

    def __exit__(self, *exc):
        torch.multinomial = self._orig
        return False


def wandb_records():
    return sys.modules["wandb"]._recorder.records


def make_native_scaler():
    """Reference NativeScaler, CPU-safe: with CUDA absent the GradScaler
    self-disables (fp32 math, scale ≡ 1 — exactly what we want for parity)
    but its state_dict() is then empty and the loops' ``state_dict()["scale"]``
    read (run_stage1.py:455) would KeyError."""
    ru = importlib.import_module("src.utils")

    class CPUSafeScaler(ru.NativeScalerWithGradNormCount):
        def state_dict(self):
            sd = super().state_dict()
            return sd if sd else {"scale": 1.0}

    return CPUSafeScaler()


class FakeDDP(torch.nn.Module):
    """Minimal `.module` wrapper: run_stage3's loop reads
    ``model.module.encoder.patch_embed.num_patches`` (run_stage3.py:468),
    i.e. it assumes the DDP wrapper. No parallelism — forward delegates."""

    def __init__(self, module):
        super().__init__()
        self.module = module

    def forward(self, *a, **k):
        return self.module(*a, **k)


def importance_to_vis_idx(importance: torch.Tensor, n_vis: int,
                          batch: int) -> np.ndarray:
    """Reference mask build (run_stage1.py:381-387): importance [B*T, N]
    permutation per frame, first ``n_vis`` columns visible → our sorted
    flat per-video visible indices [B, T*n_vis]."""
    bt, n = importance.shape
    t = bt // batch
    mask = np.ones((bt, n), bool)
    rows = np.arange(bt)[:, None]
    mask[rows, importance[:, :n_vis].numpy()] = False
    mask = mask.reshape(batch, t * n)
    return np.stack([np.nonzero(~m)[0] for m in mask]).astype(np.int32)


def bf16_representable(x: np.ndarray) -> np.ndarray:
    """Round fp32 inputs to bf16-representable values so unite_tpu's
    device-side bf16 input cast (ops/normalize.py) is exactly lossless and
    both frameworks consume bit-identical videos."""
    import ml_dtypes

    return x.astype(ml_dtypes.bfloat16).astype(np.float32)
