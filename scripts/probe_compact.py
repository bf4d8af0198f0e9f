#!/usr/bin/env python
"""Component probe for the compacted appearance path at real 300^3 shapes.

Times (value-forced, TPU): dense vs compacted dynamic field eval fwd and
fwd+grad, plus the isolated compaction primitives (top_k, compact_rows,
expand_rows, one-hot matmul) so a regression pins to one op.
"""
import os, sys, time
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.92")
import dataclasses
import jax, jax.numpy as jnp, numpy as np
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from rodynrf_tpu.fields.config import FieldConfig
from rodynrf_tpu.fields import dynamic as dyn
from rodynrf_tpu.render.pipeline import eval_dynamic_field
from rodynrf_tpu.ops.compaction import topk_select, compact_rows, expand_rows

R, S = 7168, 270  # 1024 rays x 7 batched dual passes
AABB = jnp.asarray([[-1.5, -1.67, -1.0], [1.5, 1.67, 1.0]])


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: np.asarray(jax.device_get(a)).ravel()[:1], out
    )  # value-force
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(jax.device_get(a)).ravel()[:1], out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    cfg = FieldConfig(
        grid_size=(331, 368, 220), t_size=12, near_far=(0.0, 1.0),
        density_n_comp=(16, 4, 4), app_n_comp=(48, 12, 12),
        shading_mode="MLP_Fea_late_view", fea_pe=0, view_pe=0,
        fea2dense_act="relu", grid_sample_dtype="bfloat16",
    )
    key = jax.random.PRNGKey(0)
    params = dyn.init_dynamic_field(key, cfg)
    kk = jax.random.split(key, 4)
    rays = jnp.concatenate(
        [jax.random.normal(kk[0], (R, 3)) * 0.1, jax.random.normal(kk[1], (R, 3))], -1
    )
    ts = jax.random.uniform(kk[2], (R,), minval=-1, maxval=1)
    z = jnp.sort(jax.random.uniform(kk[3], (R, S)), axis=-1)
    xyz = rays[:, None, :3] + rays[:, None, 3:] * z[..., None]
    rv = jnp.ones((R, S), bool)

    results = {}

    def rec(name, fn, *args, **kw):
        try:
            results[name] = timeit(fn, *args, **kw)
            print(f"{name:32s} {results[name]:9.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:32s} FAILED: {str(e)[:120]}", flush=True)

    # ---- primitives
    w = jax.random.uniform(key, (R, S))
    K = cfg.app_topk(S)  # 72 at app_frac
    cfgc = dataclasses.replace(cfg, app_frac=0.25)
    K = cfgc.app_topk(S)
    f_topk = jax.jit(lambda w_: topk_select(w_, K, 1e-4))
    rec("topk", f_topk, w)
    idx, keep = f_topk(w)
    x6 = jax.random.normal(key, (R, S, 6))
    f_comp = jax.jit(compact_rows)
    rec("compact_rows[R,S,6]", f_comp, x6, idx)
    xk3 = jax.random.normal(key, (R, K, 3))
    f_exp = jax.jit(lambda a, i: expand_rows(a, i, S))
    rec("expand_rows[R,K,3]", f_exp, xk3, idx)
    g_comp = jax.jit(jax.grad(lambda a: jnp.sum(compact_rows(a, idx) ** 2)))
    rec("compact_rows grad", g_comp, x6)
    g_exp = jax.jit(jax.grad(lambda a: jnp.sum(expand_rows(a, idx, S) ** 2)))
    rec("expand_rows grad", g_exp, xk3)

    # ---- full dynamic field eval, dense vs compacted
    for name, c in (("dense", cfg), ("compact", cfgc)):

        def fwd(p, cc=c):
            # tables built in-graph from p (as in train_loss), so the grad
            # flows into the raw plane/line params like the real step
            pk = dyn.pack_tables(p, cc)
            ev = eval_dynamic_field(p, cc, AABB, rays, ts, xyz, z, rv, "ndc", packed=pk)
            return jnp.sum(ev.rgb) + jnp.sum(ev.sigma) + jnp.sum(ev.blending)

        f = jax.jit(fwd)
        rec(f"dyn_eval fwd ({name})", f, params)
        g = jax.jit(jax.grad(jax.checkpoint(fwd)))
        rec(f"dyn_eval grad ({name}, remat)", g, params)




if __name__ == "__main__":
    main()
