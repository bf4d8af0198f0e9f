"""Run the ACTUAL reference implementation (/root/reference/train.py) on the
disk fixture, recording everything the JAX side needs for an apples-to-apples
comparison:

  * per-iteration TensorBoard scalars (every loss term)      -> ref_scalars.json
  * the exact ray-index stream of both permutation samplers  -> ref_record.npz
  * both models' INITIAL state dicts (+ kwargs)              -> init_dynamic.th / init_static.th
  * final checkpoints + rendered test frames (written by the reference's own
    final save + evaluation)                                  -> ref_log/golden_tiny*

Determinism contract with run_ours.py: torch.rand / torch.rand_like are
patched to return 0.5 — turning the train-time z-jitter into a constant
half-bin shift and the white-fill coin permanently tails. The JAX side runs
with StepStatics.golden_det=True which applies the identical constants.

The reference's missing pip deps (configargparse, easydict,
torch_efficient_distloss) are served from golden/shims — pure-python
re-implementations of their public APIs, written from the packages' docs/math
(see shims' docstrings). Nothing in /root/reference is modified.
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference"
sys.path.insert(0, os.path.join(HERE, "shims"))
sys.path.insert(0, REF)

import numpy as np
import torch

# ---- determinize train-time stochastic draws (contract with run_ours.py) ---
_orig_rand = torch.rand


def _det_rand(*size, **kw):
    if len(size) == 1 and isinstance(size[0], (tuple, list, torch.Size)):
        size = tuple(size[0])
    kw.pop("generator", None)
    kw.setdefault("dtype", None)
    device = kw.pop("device", None)
    out = torch.full(size, 0.5, dtype=kw["dtype"] or torch.get_default_dtype())
    return out.to(device) if device is not None else out


torch.rand = _det_rand
torch.rand_like = lambda t, **kw: torch.full_like(t, 0.5)

# The reference's `.to(x.get_device())` idiom (models/tensorBase.py:60-497)
# crashes on CPU where get_device() is -1; returning the device object keeps
# `.to()` happy on every backend.
torch.Tensor.get_device = lambda self: self.device

# ---- matplotlib >= 3.10 removed FigureCanvasAgg.tostring_rgb (train.py:2412)
from matplotlib.backends.backend_agg import FigureCanvasAgg

if not hasattr(FigureCanvasAgg, "tostring_rgb"):
    FigureCanvasAgg.tostring_rgb = lambda self: np.asarray(self.buffer_rgba())[
        ..., :3
    ].tobytes()

# np.fromstring(..., sep="") was hard-removed behaviour-wise in numpy 2 for
# binary mode; route the reference's call to frombuffer.
_orig_fromstring = getattr(np, "fromstring", None)


def _fromstring(data, dtype=float, count=-1, sep=""):
    if sep == "":
        return np.frombuffer(data, dtype=dtype, count=count).copy()
    return _orig_fromstring(data, dtype=dtype, count=count, sep=sep)


np.fromstring = _fromstring

import imageio

imageio.mimwrite = lambda *a, **k: None  # no ffmpeg in this environment

import train as ref_train  # noqa: E402  (the reference's train.py)
import renderer as ref_renderer  # noqa: E402

ref_renderer.rgb_lpips = lambda *a, **k: 0.0  # lpips pip absent; metric unused here

RECORDS = {"ray_idx": [], "ray_idx_rand": []}
SCALARS = {}


class RecordingWriter:
    def __init__(self, *a, **k):
        pass

    def add_scalar(self, tag, value, global_step=None, **kw):
        SCALARS.setdefault(tag, []).append([int(global_step), float(value)])

    def add_image(self, *a, **k):
        pass

    add_images = add_image
    add_figure = add_image

    def flush(self):
        pass

    def close(self):
        pass


ref_train.SummaryWriter = RecordingWriter

# record both samplers' id streams (creation order: trainingSampler first,
# trainingSampler_2 second — reference train.py:1011-1012)
_samplers = []
_orig_sampler_init = ref_train.SimpleSampler.__init__
_orig_nextids = ref_train.SimpleSampler.nextids


def _rec_init(self, total, batch):
    _orig_sampler_init(self, total, batch)
    self._golden_slot = "ray_idx" if len(_samplers) == 0 else "ray_idx_rand"
    _samplers.append(self)


def _rec_nextids(self):
    ids = _orig_nextids(self)
    RECORDS[self._golden_slot].append(ids.cpu().numpy().copy())
    return ids


ref_train.SimpleSampler.__init__ = _rec_init
ref_train.SimpleSampler.nextids = _rec_nextids

# GOLDEN_OUT redirects record/log outputs (basin runs keep the
# 260-iter golden fixtures intact); the fixture datadir is shared
OUT = os.environ.get("GOLDEN_OUT", os.path.join(HERE, "out"))
MODELS = {}


def _wrap_model(cls, tag):
    class Wrapped(cls):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            MODELS[tag] = self
            path = os.path.join(OUT, f"init_{tag}.th")
            if not os.path.exists(path):
                torch.save(
                    {"kwargs": self.get_kwargs(), "state_dict": self.state_dict()}, path
                )

    Wrapped.__name__ = cls.__name__
    return Wrapped


def _install_grad_dump():
    """GOLDEN_GRAD_CHECK mode: at the first main-optimizer step (backward
    done, nothing applied yet), dump every parameter gradient — both fields,
    pose and fov embeddings — then stop. Compared against jax.grad by
    golden/grad_check.py."""
    embeddings = []
    orig_emb_init = torch.nn.Embedding.__init__

    def emb_init(self, *a, **k):
        orig_emb_init(self, *a, **k)
        embeddings.append(self)

    torch.nn.Embedding.__init__ = emb_init

    orig_step = torch.optim.Adam.step
    state = {"done": False}

    def step(self, *a, **k):
        if not state["done"] and len(self.param_groups) > 2:  # the field optimizer
            state["done"] = True
            grads = {}
            for tag, model in MODELS.items():
                for name, p in model.named_parameters():
                    if p.grad is not None:
                        grads[f"{tag}/{name}"] = p.grad.detach().numpy().copy()
            # creation order: poses_refine then fov_refine (train.py:972, 976)
            if len(embeddings) >= 1 and embeddings[0].weight.grad is not None:
                grads["pose"] = embeddings[0].weight.grad.detach().numpy().copy()
            if len(embeddings) >= 2 and embeddings[1].weight.grad is not None:
                grads["fov"] = embeddings[1].weight.grad.detach().numpy().copy()
            np.savez_compressed(os.path.join(OUT, "grads_ref.npz"), **grads)
            print(f"dumped {len(grads)} gradient tensors -> grads_ref.npz")
            raise SystemExit(0)
        return orig_step(self, *a, **k)

    torch.optim.Adam.step = step


def main():
    os.makedirs(OUT, exist_ok=True)
    cfg = sys.argv[1] if len(sys.argv) > 1 else os.path.join(HERE, "tiny.txt")

    ref_train.TensorVMSplit = _wrap_model(ref_train.TensorVMSplit, "static")
    ref_train.TensorVMSplit_TimeEmbedding = _wrap_model(
        ref_train.TensorVMSplit_TimeEmbedding, "dynamic"
    )

    import opt

    args = opt.config_parser(
        [
            "--config",
            cfg,
            "--datadir",
            os.path.join(HERE, "out", "fixture"),
            "--basedir",
            os.path.join(OUT, "ref_log"),
        ]
    )
    torch.set_default_dtype(torch.float32)
    torch.manual_seed(20211202)
    np.random.seed(20211202)

    if os.environ.get("GOLDEN_GRAD_CHECK"):
        _install_grad_dump()
        try:
            ref_train.reconstruction(args)
        except SystemExit:
            return
        return

    ref_train.reconstruction(args)

    np.savez_compressed(
        os.path.join(OUT, "ref_record.npz"),
        ray_idx=np.stack(RECORDS["ray_idx"], 0),
        ray_idx_rand=np.stack(RECORDS["ray_idx_rand"], 0),
    )
    with open(os.path.join(OUT, "ref_scalars.json"), "w") as fh:
        json.dump(SCALARS, fh)
    print(
        f"recorded {len(RECORDS['ray_idx'])} iterations, "
        f"{len(SCALARS)} scalar streams -> {OUT}"
    )


if __name__ == "__main__":
    main()
