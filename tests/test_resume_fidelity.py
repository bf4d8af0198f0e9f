"""Full-fidelity resume (VERDICT item 9): a run saved at iteration k and
resumed must produce the EXACT same trajectory as the uninterrupted run —
params, Adam moments, PRNG key, and sampler states all carried.

(The reference's own resume restores only the dynamic model and restarts the
static model/optimizers — train.py:896-901 — so this is a framework-quality
upgrade, not a parity requirement.)
"""

import os

import jax
import numpy as np

from rodynrf_tpu.testing import tiny_trainer


import pytest

pytestmark = pytest.mark.integration


def _run(tr, n):
    out = []
    for _ in range(n):
        m = tr.run_step()
        out.append(float(m["total_loss"]))
    return out


def test_resume_is_exact_continuation(tmp_path):
    # 10 iterations crosses the tiny upsample at 8 — the save at iteration 10
    # carries post-upsample grids and fresh field-Adam moments
    tr_a = tiny_trainer("ndc", 1)
    losses_head = _run(tr_a, 10)
    ckpt = os.path.join(tmp_path, "full.npz")
    tr_a.save_full(ckpt)
    grid_at_save = tr_a.static_cfg.grid_size
    losses_cont = _run(tr_a, 4)  # crosses the next upsample at iteration 12

    tr_b = tiny_trainer("ndc", 1)
    tr_b.args.ckpt = ckpt
    tr_b._resume(ckpt)
    tr_b._build_step()
    assert tr_b.iteration == 10
    assert tr_b.static_cfg.grid_size == grid_at_save

    # identical params and Adam moments at the resume point were saved, so
    # the continuation must be bit-identical (same compiled program, same
    # inputs). Pose/focal moments survived the upsample too.
    losses_resumed = _run(tr_b, 4)
    np.testing.assert_array_equal(losses_cont, losses_resumed)

    # parameter trees equal bitwise after the continuation
    flat_a = jax.tree_util.tree_leaves(tr_a.params)
    flat_b = jax.tree_util.tree_leaves(tr_b.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
