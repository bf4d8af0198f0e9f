"""The jitted training step: all render passes + every loss term, one XLA program.

This replaces the reference's 1,800-line eager loop body
(reference: train.py:1032-2351) with a single compiled function. Per
iteration it evaluates the static+dynamic field pair over up to 7 ray sets
(SURVEY.md §3.1 passes A-G):

  A  training rays (detached)           -> RGB/mask/flow/monodepth losses
  B  novel-time rays (detached)         -> novel mask/order/distortion losses
  C  flow-warped fwd-neighbor rays      -> disparity consistency (fwd)
  D  flow-warped bwd-neighbor rays      -> disparity consistency (bwd)
  E  training rays (NOT detached)       -> static RGB + pose/focal gradients
  F  pixel (i+1) neighbor rays          -> disparity smoothness   (pose optim)
  G  pixel (j+1) neighbor rays          -> disparity smoothness   (pose optim)

The reference's detach topology is reproduced exactly with
`lax.stop_gradient` (rays detached in A-D, focal detached in dynamic flow
losses, static rgb/sigma detached in A-D compositing): see inline citations.

Host-side schedule state (per-group learning rates with upsample resets and
the pose/focal freeze) is passed in as runtime scalars so the compiled step
never retraces (train/schedule.py computes them).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.rays import get_ray_directions_lean, get_rays_lean, ids2pixel, ndc_rays_blender
from ..core.se3 import pose_to_mtx
from ..fields import dynamic as dyn_field
from ..fields import static as stat_field
from ..fields.config import FieldConfig
from ..ops.compositing import (
    RenderOutputs,
    dynamic_side_weights,
    raw2outputs,
    static_side_outputs,
)
from ..ops.distortion import eff_distloss
from ..ops.regularizers import line_orthogonality
from ..render.flow import induce_flow
from ..render.pipeline import eval_dynamic_field, eval_static_field
from ..render.sampling import sample_xyz
from . import losses as L

sg = jax.lax.stop_gradient


@dataclass(frozen=True)
class LossWeights:
    """Static loss weights (reference flag defaults, opt.py:80-106)."""

    distortion_static: float = 0.0
    distortion_dynamic: float = 0.0
    monodepth_static: float = 0.04
    monodepth_dynamic: float = 0.04
    small_scene_flow: float = 0.1
    smooth_scene_flow: float = 0.1
    l1: float = 0.0
    ortho: float = 0.0
    tv_density: float = 0.0
    tv_app: float = 0.0


@dataclass(frozen=True)
class StepStatics:
    """Compile-time configuration of the train step."""

    static_cfg: FieldConfig
    dynamic_cfg: FieldConfig
    H: int
    W: int
    n_cams: int
    n_samples: int
    ray_type: str = "ndc"
    optimize_poses: bool = False
    optimize_focal: bool = False
    use_disp: bool = True
    white_bg: bool = False
    n_iters: int = 100000
    upsamp0: int = 2000
    upsamp3: int = 8000
    lr_factor: float = 1.0  # per-iteration TV-weight decay (train.py:1735, 1748)
    weights: LossWeights = LossWeights()
    step_size: float = 0.01  # world-sampler march step
    # rematerialize field evaluations in the backward pass: recomputes each
    # pass's field internals instead of storing ~7 passes of [B*S, 64+]
    # activations — required to fit the 640³ schedule in HBM, ~free when
    # gather-bound
    remat: bool = True
    # golden-comparison mode: replaces every stochastic train-time draw with
    # the deterministic value the reference harness patches torch.rand to
    # (0.5): sampler jitter becomes a constant half-bin shift and the
    # white-fill coin always lands tails (golden/run_reference.py applies the
    # matching patch to the reference). Bit-for-bit comparable trajectories.
    golden_det: bool = False
    # batch the per-pass field evaluations: ONE dynamic eval over the rows of
    # every pass that needs the dynamic field (A-D) and TWO static evals
    # (split by detach topology) over the passes that need the static field
    # (A/B + E-G/FF/BB) instead of one pair per pass. Identical math, detach
    # structure, and per-pass RNG (pass keys are split exactly as in the
    # sequential path); cuts the per-instance gather/scatter overhead that
    # dominates the TPU step and runs the MLPs at MXU-friendly batch sizes.
    fused_passes: bool = True
    # gradient accumulation: split the ray batch into this many equal
    # micro-batches, scan-accumulate their (averaged) gradients, apply the
    # optimizer once — the full-batch gradient exactly (see make_train_step).
    # The scan structurally bounds live eval memory; required to fit the
    # 640^3 schedule single-chip.
    grad_accum: int = 1
    # max dual passes per batched DYNAMIC field eval (0 = all in one). The
    # gathered corner rows of one eval ([passes*B*S, 12, C] take output plus
    # its masked copy) are live simultaneously; chunking bounds them while
    # keeping each take far above the gather-rate plateau. The trainer sizes
    # this from the HBM budget (trainer._pass_chunk); the static evals'
    # rows are ~5x narrower and stay unchunked.
    pass_chunk: int = 0
    # cross-pass forward sharing: passes A/B/E run over one shared sample set
    # (one jitter draw instead of three) and A/B reuse E's static evaluation
    # detached — exact elimination of two static field evals per step (the
    # static field is time-invariant, so B's random-time static equals A's).
    # The only semantic delta vs the reference's per-pass re-render
    # (train.py:1092, 1166, 1755) is sharing the i.i.d. jitter draw; in
    # golden_det mode the paths are bit-identical.
    share_forward: bool = True
    # debug: fill UNCONSUMED RenderOutputs fields of mode-restricted passes
    # with NaN instead of zeros, so an accidental read poisons the loss
    # instead of silently training on zeros (see _partial_outputs)
    debug_nan_fill: bool = False
    # train-time occupancy mask: AND each pass's ray_valid with the
    # AlphaGridMask occupancy bit at (sample, t) — the reference's early-out
    # contract (tensorBase.py:591-629, 745-765) applied to TRAINING, which
    # the reference itself never does (its update_AlphaMask_list flag is
    # parsed but dead, opt.py:211). The mask volume rides in `data`
    # ("alpha_volume" [D,H,W,T] uint8, "alpha_aabb" [2,3]) so it crosses the
    # jit boundary as a device buffer, never as an HLO constant. Passes
    # sharing one sample set (A/B/E under share_forward) use the UNION of
    # their per-time occupancies, keeping the cross-pass static-eval sharing
    # exact (a superset of per-pass masking: strictly closer to the unmasked
    # reference). Off by default; activated by the trainer once
    # update_AlphaMask_list fires (--compact_train).
    use_alpha_mask: bool = False
    # static (D, H, W, T) dims of the FLAT data["alpha_volume"] — the volume
    # rides 1-D so the jit parameter needs no per-step relayout copy before
    # the occupancy gather (fields/alpha_mask.occupancy_nearest docstring)
    alpha_shape: tuple = ()
    # with use_alpha_mask: compact each pass's samples to its per-ray [R, K]
    # occupied bucket (K static) before the field evaluations — the eval
    # renderer's [R, K] early-out (render/renderer.py:129-164) applied to the
    # train step. EXACT vs the dense-masked step whenever every ray's
    # occupied count <= K (masked samples carry sigma = blending = rgb = 0
    # through the compositor; tests/test_compact_train.py); rays beyond K
    # drop their FARTHEST occupied samples. The trainer sizes K from a
    # measured occupancy probe (Trainer._probe_compact_k). 0 = dense.
    compact_k: int = 0
    # with compact_k: additionally run each field evaluation's PER-SAMPLE
    # work (feature gathers + warp + shading MLP) on a FLAT bucket of
    # compact_flat x R slots holding only the occupied samples, scattered
    # back to the [R, K] layout (render/pipeline.py flat_n path). The [R, K]
    # bucket pads every ray to the p99.5 occupancy (K=96 vs mean 38 at the
    # measured converged-scene skew) — the flat bucket's work scales with
    # the batch-MEAN occupancy instead, the same argument as the eval
    # renderer's chunk-level flat compaction (renderer.py _flat_fn). EXACT
    # vs the [R, K] step whenever the batch's total occupied count fits
    # (CLT-concentrated at batch 1024; trainer._probe_compact_k sizes it
    # with a 4-sigma + 10% margin); overflow drops trailing rays' samples.
    # 0 = dense [R, K] evals.
    compact_flat: int = 0
    # data-parallel mesh: when set, the ray batch's partitioning is asserted
    # with sharding constraints instead of relying on GSPMD inference. The
    # trainer guarantees the batch divides this mesh (non-divisible batches
    # shard over the largest divisor sub-mesh — uneven tiled intermediates
    # trip an XLA SPMD partitioner CHECK in scatter handling).
    mesh: Any = None


def focal_from_fov(fov: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(reference: train.py:1038-1041)."""
    return max(H, W) / 2.0 / jnp.tan(fov)


def _rays_from_idx(ray_idx, poses_mtx, focal, S: StepStatics):
    """Pixel ids -> packed rays + per-ray pose/time index (train.py:1066-1088)."""
    H, W = S.H, S.W
    i, j, view_ids = ids2pixel(W, H, ray_idx)
    dirs = get_ray_directions_lean(i, j, (focal, focal), (W / 2, H / 2))
    poses_per_ray = poses_mtx[view_ids]
    rays_o, rays_d = get_rays_lean(dirs, poses_per_ray)
    if S.ray_type == "ndc":
        rays_o, rays_d = ndc_rays_blender(H, W, (focal, focal), 1.0, rays_o, rays_d)
    return jnp.concatenate([rays_o, rays_d], -1), i, j, view_ids


def _rays_from_uv(uv, pose_per_ray, focal, S: StepStatics):
    """Flow-displaced pixel coords -> rays (train.py:1433-1455)."""
    H, W = S.H, S.W
    dirs = jnp.stack(
        [
            (uv[..., 0] - W / 2) / focal,
            -(uv[..., 1] - H / 2) / focal,
            -jnp.ones_like(uv[..., 0]),
        ],
        -1,
    )
    rays_o, rays_d = get_rays_lean(dirs, pose_per_ray)
    if S.ray_type == "ndc":
        rays_o, rays_d = ndc_rays_blender(H, W, (focal, focal), 1.0, rays_o, rays_d)
    return jnp.concatenate([rays_o, rays_d], -1)


class PassSpec(NamedTuple):
    """One render pass: ray set + time stamps + RNG + detach topology.

    mode — which field evaluations the pass's consumed losses actually need
    (the reference re-renders the full dual model every pass, train.py:1092,
    1755, but each loss group reads only a subset of the outputs; evaluating
    only that subset is loss- and gradient-identical):
      "dual":     both fields + dual compositor            (A, B)
      "dyn":      dynamic field only; losses consume the normalized
                  weights_d + sampler points                (C, D)
      "stat_out": static field + static-side compositor (rgb_s/depth_s/
                  weights_s incl. white fill)               (E, F, G)
      "stat":     static field only, no compositor          (FF, BB)

    samp — optional precomputed (xyz, z_vals, ray_valid) shared with other
    passes over the same ray set (cross-pass forward sharing, see
    train_loss); when set, the pass's own jitter key is unused.
    static_from — reuse the named pass's static FieldEval (detached) instead
    of evaluating the static field: exact when the passes share `samp` and
    the static field is time-invariant (TensorVMSplit ignores t, reference
    tensoRF.py:118-196; every static shading mode ignores its time input,
    tensorBase.py:81-147).
    """

    rays: Any  # [R, 6] (pre-detached where the reference detaches)
    ts: Any  # [R]
    k_samp: Any  # sampler-jitter key (None in golden_det mode)
    k_comp: Any  # compositor white-fill key (None: no fill / static-only)
    detach_static: bool  # reference's .detach() on static rgb/sigma (A-D)
    mode: str  # "dual" | "dyn" | "stat_out" | "stat"
    samp: Any = None  # optional shared (xyz, z_vals, ray_valid)
    static_from: Any = None  # provider pass name or None


def _partial_outputs(R: int, nS: int, debug_nan: bool = False, **filled) -> RenderOutputs:
    """A RenderOutputs with only the consumed fields filled; the rest are
    zeros (dead values XLA eliminates).

    debug_nan (StepStatics.debug_nan_fill) fills the unconsumed fields with
    NaN instead, so a loss that accidentally reads one surfaces immediately
    as a non-finite total (tests/test_fused_passes.py::test_debug_nan_fill
    asserts the production loss set stays finite under it)."""
    fill = jnp.nan if debug_nan else 0.0
    z_r = jnp.full((R,), fill, jnp.float32)
    z_rs = jnp.full((R, nS), fill, jnp.float32)
    z_r3 = jnp.full((R, 3), fill, jnp.float32)
    defaults = dict(
        rgb_full=z_r3, depth_full=z_r, acc_full=z_r, weights_full=z_rs,
        rgb_s=z_r3, depth_s=z_r, acc_s=z_r, weights_s=z_rs,
        rgb_d=z_r3, depth_d=z_r, acc_d=z_r, weights_d=z_rs,
        dynamicness=z_r,
    )
    defaults.update(filled)
    return RenderOutputs(**defaults)


def _unpack_samp(samp):
    """samp is (xyz, z_vals, valid) or, with train-time compaction,
    (xyz, z_vals, valid, dists) — compacted z_vals cannot reproduce the
    dense consecutive-z dists, so they ride precomputed (render/renderer.py
    uses the same convention)."""
    if len(samp) == 4:
        return samp
    xyz, z_vals, valid = samp
    return xyz, z_vals, valid, None


def _occupancy(data, xyz, ts, valid, alpha_shape=None):
    """valid & alpha-mask occupancy at each (sample, time) — the reference's
    early-out (tensorBase.py:745-765) as a where-mask. Selection only: the
    mask query runs on detached positions (a boolean carries no gradient in
    the reference either). ONE gathered byte per sample: data["alpha_volume"]
    is pre-dilated so the nearest-voxel test keeps a superset of the
    reference's 8-corner trilinear>0 (fields/alpha_mask.occupancy_nearest)."""
    from ..fields.alpha_mask import occupancy_nearest

    R, S_ = valid.shape
    t_flat = jnp.broadcast_to(ts[:, None], (R, S_)).reshape(-1)
    occ = occupancy_nearest(
        data["alpha_volume"], data["alpha_aabb"], sg(xyz).reshape(-1, 3), t_flat,
        shape=alpha_shape,
    ).reshape(R, S_)
    return valid & occ


def _compact_samp(xyz, z_vals, occ, rays, ray_type, K: int):
    """Per-ray [R, K] occupied bucket (the eval compactor's selection,
    render/renderer.py:129-148): valid-first stable order preserves ascending
    z among kept samples (transmittance order); dropped slots carry keep=0 ->
    sigma = blending = rgb = 0. Returns ((xyz_c, z_c, keep, dists_c), idx);
    dists are the DENSE consecutive-z intervals gathered at idx.

    Index-floor discipline (PERF.md §1: takes serialize per index): xyz, z,
    and dists ride ONE packed [R, S, 5] take (one gather forward, one
    scatter in the transpose) instead of three, and `keep` needs no gather
    at all — valid-first ordering makes it arange(K) < occupied_count."""
    from ..render.pipeline import _dists_and_viewdirs

    dists, _ = _dists_and_viewdirs(rays, z_vals, ray_type)
    order = jnp.argsort(jnp.logical_not(occ), axis=1, stable=True)
    idx = order[:, :K]
    count = jnp.sum(occ.astype(jnp.int32), axis=1)
    keep = jnp.arange(K, dtype=jnp.int32)[None, :] < count[:, None]
    packed = jnp.concatenate([xyz, z_vals[..., None], dists[..., None]], axis=-1)
    pk = jnp.take_along_axis(packed, idx[..., None], axis=1)
    samp = (pk[..., :3], pk[..., 3], keep, pk[..., 4])
    return samp, idx


def _dual_pass(params, S: StepStatics, aabb, sp: PassSpec, packs=None, shared_st=None):
    """Sampler + static field + dynamic field + dual compositor for one ray set.

    detach_static reproduces the reference's `.detach()` on static rgb/sigma
    in passes A-D (train.py:1152-1153 etc.); in that case the static field is
    evaluated entirely under stop_gradient (no VJP residuals at all).

    packs: optional (packed_static, packed_dynamic) gather tables built ONCE
    per step (train_loss hoists them so the table construction never re-runs
    per pass or per remat recomputation).

    shared_st: another pass's static FieldEval to reuse (detached) instead of
    evaluating the static field — valid when this pass shares `samp` with the
    provider (see PassSpec.static_from).
    """
    packed_st, packed_dn = packs if packs is not None else (None, None)
    rays, ts = sp.rays, sp.ts
    if sp.samp is not None:
        xyz, z_vals, ray_valid, dists_pre = _unpack_samp(sp.samp)
    else:
        xyz, z_vals, ray_valid = sample_xyz(
            rays, S.n_samples, S.ray_type, S.static_cfg.near_far, aabb, S.step_size,
            sp.k_samp, det_jitter=S.golden_det,
        )
        dists_pre = None

    # flat-bucket evals apply only on compacted geometry (dists_pre is the
    # compaction marker: occupied samples are a prefix of each [R, K] row)
    flat_n = S.compact_flat * rays.shape[0] if (
        S.compact_flat > 0 and dists_pre is not None
    ) else 0

    def run_static(p, rays_, xyz_, packed_, dists_):
        return eval_static_field(
            p, S.static_cfg, aabb, rays_, ts, xyz_, z_vals, ray_valid, S.ray_type,
            packed=packed_, dists=dists_, flat_n=flat_n,
        )

    def run_dynamic(p, rays_, xyz_, packed_, dists_):
        return eval_dynamic_field(
            p, S.dynamic_cfg, aabb, rays_, ts, xyz_, z_vals, ray_valid, S.ray_type,
            packed=packed_, dists=dists_, flat_n=flat_n,
        )

    if S.remat:
        run_static = jax.checkpoint(run_static)
        run_dynamic = jax.checkpoint(run_dynamic)

    R, nS = z_vals.shape

    if sp.mode == "dyn":
        # losses of this pass consume only weights_d + the sampler's points
        # (reference train.py:1431-1625): the static eval never runs
        dn = run_dynamic(params["dynamic"], rays, xyz, packed_dn, dists_pre)
        out = _partial_outputs(
            R, nS, S.debug_nan_fill,
            weights_d=dynamic_side_weights(dn.sigma, dn.dists),
        )
        return out, None, dn, z_vals

    if shared_st is not None:
        # cross-pass forward sharing: the provider's static eval ran on the
        # same sample positions (shared `samp`); detaching its outputs is
        # value- and gradient-identical to re-evaluating under stop_gradient
        # (the reference's per-pass re-render, train.py:1092 vs 1755, differs
        # only in its fresh jitter draw)
        st = jax.tree_util.tree_map(sg, shared_st)
    elif sp.detach_static:
        st = run_static(sg(params["static"]), sg(rays), sg(xyz),
                        jax.tree_util.tree_map(sg, packed_st),
                        None if dists_pre is None else sg(dists_pre))
        st = jax.tree_util.tree_map(sg, st)
    else:
        st = run_static(params["static"], rays, xyz, packed_st, dists_pre)

    if sp.mode == "stat":
        return None, st, None, z_vals

    if sp.mode == "stat_out":
        # losses consume rgb_s/depth_s/weights_s only (train.py:1755-2311):
        # the dynamic eval never runs; the static-side compositor keeps the
        # dual compositor's exact math incl. the white-fill coin
        rgb_s, depth_s, acc_s, weights_s = static_side_outputs(
            st.rgb, st.sigma, st.dists, st.z_vals, rays,
            is_train=True, ray_type=S.ray_type, key=sp.k_comp,
        )
        out = _partial_outputs(
            R, nS, S.debug_nan_fill,
            rgb_s=rgb_s, depth_s=depth_s, acc_s=acc_s, weights_s=weights_s,
        )
        return out, st, None, z_vals

    dn = run_dynamic(params["dynamic"], rays, xyz, packed_dn, dists_pre)

    out = raw2outputs(
        st.rgb, st.sigma, dn.rgb, dn.sigma, dn.dists, dn.blending, dn.z_vals, rays,
        is_train=True, ray_type=S.ray_type, key=sp.k_comp,
    )
    return out, st, dn, z_vals


def _cat(parts):
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _slice_tree(tree, i0, i1):
    return jax.tree_util.tree_map(lambda a: a[i0:i1], tree)


def _batched_passes(params, S: StepStatics, aabb, specs, packs):
    """All render passes through batched field evaluations.

    Instead of one (static, dynamic) evaluation pair per pass (the reference
    train.py re-renders the full dual model per loss group), the passes'
    rows are concatenated and evaluated as:
      * ONE dynamic eval over the passes whose losses need it (duals A/B +
        dyn-only C/D),
      * ONE fully-detached static eval over the detach_static duals (A/B),
      * ONE grad-carrying static eval over the static-consuming passes
        (E/F/G + FF/BB),
      * ONE batched dual compositor over the dual passes (per-pass
        white-fill coins drawn from the same per-pass keys and broadcast
        over that pass's rows); dyn/stat_out passes get the dynamic-side /
        static-side compositor subsets (ops/compositing.py).
    Math, detach topology, and RNG are identical to the sequential path
    (tests/test_fused_passes.py asserts value + gradient parity); what
    changes is instance count: gathers/scatters/MLPs run once at a larger
    batch, which is what the index-rate-bound TPU profile wants (PERF.md).
    """
    packed_st, packed_dn = packs if packs is not None else (None, None)
    names = list(specs)
    # dynamic eval covers dual + dyn-only passes; static evals cover dual +
    # stat_out + stat passes, split by detach topology (see PassSpec.mode);
    # passes reusing another pass's static eval (static_from) never evaluate
    # the static field themselves
    dyn_names = [n for n in names if specs[n].mode in ("dual", "dyn")]
    dual_names = [n for n in names if specs[n].mode == "dual"]
    det_names = [
        n for n in dual_names
        if specs[n].detach_static and specs[n].static_from is None
    ]
    grad_names = [
        n for n in names
        if (specs[n].mode == "dual" and not specs[n].detach_static)
        or specs[n].mode in ("stat_out", "stat")
    ]
    assert dual_names == dyn_names[: len(dual_names)], (
        "dual passes must precede dyn-only passes (dn_all row alignment)"
    )

    # per-pass sampling (keeps each pass's jitter key; shared-geometry passes
    # carry their precomputed samp); entries normalized to (xyz, z, valid,
    # dists-or-None) — see _unpack_samp
    samp = {
        n: _unpack_samp(specs[n].samp)
        if specs[n].samp is not None
        else sample_xyz(
            specs[n].rays, S.n_samples, S.ray_type, S.static_cfg.near_far, aabb,
            S.step_size, specs[n].k_samp, det_jitter=S.golden_det,
        )
        + (None,)
        for n in names
    }
    R = {n: specs[n].rays.shape[0] for n in names}

    def _shard_rows(x):
        # re-assert row partitioning after the concat: each pass's rows are
        # data-sharded, but GSPMD's inferred sharding for the concatenation
        # is not guaranteed — pin it so the batched evals stay partitioned
        if S.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec

        spec = PartitionSpec("data", *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(S.mesh, spec))

    def group_inputs(group):
        rays = _shard_rows(_cat([specs[n].rays for n in group]))
        ts = _shard_rows(_cat([specs[n].ts for n in group]))
        xyz = _shard_rows(_cat([samp[n][0] for n in group]))
        zv = _shard_rows(_cat([samp[n][1] for n in group]))
        rv = _shard_rows(_cat([samp[n][2] for n in group]))
        # precomputed dists are all-or-nothing (train-time compaction sets
        # them for every pass, the dense path for none)
        ds = [samp[n][3] for n in group]
        dv = None if ds[0] is None else _shard_rows(_cat(ds))
        return rays, ts, xyz, zv, rv, dv

    def _flat_n(rv_, dists_):
        # flat-bucket evals on compacted geometry only (see _dual_pass);
        # scales with the group's concatenated row count
        if S.compact_flat > 0 and dists_ is not None:
            return S.compact_flat * rv_.shape[0]
        return 0

    def run_static(p, rays_, ts_, xyz_, zv_, rv_, packed_, dists_):
        return eval_static_field(
            p, S.static_cfg, aabb, rays_, ts_, xyz_, zv_, rv_, S.ray_type,
            packed=packed_, dists=dists_, flat_n=_flat_n(rv_, dists_),
        )

    def run_dynamic(p, rays_, ts_, xyz_, zv_, rv_, packed_, dists_):
        return eval_dynamic_field(
            p, S.dynamic_cfg, aabb, rays_, ts_, xyz_, zv_, rv_, S.ray_type,
            packed=packed_, dists=dists_, flat_n=_flat_n(rv_, dists_),
        )

    if S.remat:
        run_static = jax.checkpoint(run_static)
        run_dynamic = jax.checkpoint(run_dynamic)

    # dynamic: one eval over all dual+dyn passes — chunked when S.pass_chunk
    # > 0 so one eval's gathered-row temps fit HBM (each chunk is its own
    # remat region; takes stay far above the gather-rate plateau)
    d_rays = _shard_rows(_cat([specs[n].rays for n in dual_names]))
    if S.pass_chunk and S.pass_chunk < len(dyn_names):
        chunks = [
            dyn_names[i : i + S.pass_chunk]
            for i in range(0, len(dyn_names), S.pass_chunk)
        ]
    else:
        chunks = [dyn_names]
    dn_parts = []
    dep = None
    for grp in chunks:
        g = group_inputs(grp)
        if dep is not None:
            # serialize the chunks: without this barrier XLA overlaps every
            # chunk's eval (and, via the barrier's transpose, every chunk's
            # rematted backward), keeping all chunks' gathered-row blocks
            # live at once — exactly the memory chunking exists to bound
            # (measured: 15.4-16.9 GB HLO temps, OOM, at 300^3 bf16)
            garrs = g[:5] if g[5] is None else g
            *gb, _ = jax.lax.optimization_barrier((*garrs, dep))
            g = tuple(gb) + ((None,) if g[5] is None else ())
        ev = run_dynamic(
            params["dynamic"], g[0], g[1], g[2], g[3], g[4], packed_dn, g[5]
        )
        dep = ev.sigma
        dn_parts.append(ev)
    dn_all = (
        dn_parts[0]
        if len(dn_parts) == 1
        else jax.tree_util.tree_map(lambda *xs: _cat(list(xs)), *dn_parts)
    )

    # static, fully detached group (reference detaches static in A-D)
    st_parts = []
    if det_names:
        g = group_inputs(det_names)
        st_det = run_static(
            sg(params["static"]), sg(g[0]), g[1], sg(g[2]), g[3], g[4],
            jax.tree_util.tree_map(sg, packed_st),
            None if g[5] is None else sg(g[5]),
        )
        st_det = jax.tree_util.tree_map(sg, st_det)
        st_parts.append((det_names, st_det))
    # static, grad-carrying group (E/F/G duals + FF/BB static-only)
    if grad_names:
        g = group_inputs(grad_names)
        st_grad = run_static(
            params["static"], g[0], g[1], g[2], g[3], g[4], packed_st, g[5]
        )
        st_parts.append((grad_names, st_grad))

    # split static evals per pass
    st_by_name = {}
    for group, ev in st_parts:
        off = 0
        for n in group:
            st_by_name[n] = _slice_tree(ev, off, off + R[n])
            off += R[n]
    # cross-pass forward sharing: consumers take the provider's static eval
    # detached (exact: shared samp + time-invariant static field)
    for n in names:
        sf = specs[n].static_from
        if sf is not None:
            st_by_name[n] = jax.tree_util.tree_map(sg, st_by_name[sf])

    # split the dynamic eval per pass (dual passes are the prefix of dn_all)
    dn_by_name = {}
    off = 0
    for n in dyn_names:
        dn_by_name[n] = _slice_tree(dn_all, off, off + R[n])
        off += R[n]
    dn_dual = _slice_tree(dn_all, 0, sum(R[n] for n in dual_names))

    # batched dual compositor over the dual passes only
    st_rgb = _cat([st_by_name[n].rgb for n in dual_names])
    st_sigma = _cat([st_by_name[n].sigma for n in dual_names])
    white = None
    if not S.golden_det:
        coins = [
            jnp.broadcast_to(jax.random.uniform(specs[n].k_comp, ()) < 0.5, (R[n],))
            for n in dual_names
        ]
        white = _cat(coins)
    out_all = raw2outputs(
        st_rgb, st_sigma, dn_dual.rgb, dn_dual.sigma, dn_dual.dists, dn_dual.blending,
        dn_dual.z_vals, d_rays, is_train=True, ray_type=S.ray_type, white=white,
    )

    # assemble per-pass results
    res = {}
    off = 0
    for n in dual_names:
        res[n] = (
            _slice_tree(out_all, off, off + R[n]),
            st_by_name[n],
            dn_by_name[n],
            samp[n][1],
        )
        off += R[n]
    for n in names:
        sp = specs[n]
        if sp.mode == "dyn":
            dn = dn_by_name[n]
            out = _partial_outputs(
                R[n], S.n_samples, S.debug_nan_fill,
                weights_d=dynamic_side_weights(dn.sigma, dn.dists),
            )
            res[n] = (out, None, dn, samp[n][1])
        elif sp.mode == "stat_out":
            st = st_by_name[n]
            white_n = None
            if not S.golden_det:
                white_n = jnp.broadcast_to(
                    jax.random.uniform(sp.k_comp, ()) < 0.5, (R[n],)
                )
            rgb_s, depth_s, acc_s, weights_s = static_side_outputs(
                st.rgb, st.sigma, st.dists, st.z_vals, sp.rays,
                is_train=True, ray_type=S.ray_type, white=white_n,
            )
            res[n] = (
                _partial_outputs(
                    R[n], S.n_samples, S.debug_nan_fill,
                    rgb_s=rgb_s, depth_s=depth_s, acc_s=acc_s, weights_s=weights_s,
                ),
                st, None, samp[n][1],
            )
        elif sp.mode == "stat":
            res[n] = (None, st_by_name[n], None, samp[n][1])
    return res


def _run_passes(params, S: StepStatics, aabb, specs, packs):
    """Dispatch: batched (fused_passes) or sequential per-pass evaluation.

    In remat mode the sequential passes are chained through an
    optimization_barrier: XLA otherwise overlaps every pass's rematted
    backward region, keeping all passes' gathered blocks live at once
    (measured 16.4 GB HLO temps -> OOM at 640^3). In store mode (<=350^3)
    the overlap is harmless — residuals are small — and free overlap is
    part of why store mode measures fastest, so no chain there."""
    if S.fused_passes:
        return _batched_passes(params, S, aabb, specs, packs)
    res = {}
    dep = None
    # static-eval providers (PassSpec.static_from) must run before their
    # consumers; keep the original order otherwise
    providers = {sp.static_from for sp in specs.values() if sp.static_from}
    names = [n for n in specs if n in providers] + [
        n for n in specs if n not in providers
    ]
    for n in names:
        sp = specs[n]
        if dep is not None and S.remat:
            if sp.samp is not None:
                # samp is a 3- or 4-tuple (see _unpack_samp); a None dists
                # entry stays outside the barrier (barriers carry arrays)
                samp_arrs = tuple(a for a in sp.samp if a is not None)
                *flat, _ = jax.lax.optimization_barrier(
                    (*samp_arrs, sp.rays, sp.ts, dep)
                )
                samp_b = tuple(flat[: len(samp_arrs)])
                if len(samp_b) < len(sp.samp):
                    samp_b = samp_b + (None,)
                sp = sp._replace(rays=flat[-2], ts=flat[-1], samp=samp_b)
            else:
                rays_b, ts_b, _ = jax.lax.optimization_barrier((sp.rays, sp.ts, dep))
                sp = sp._replace(rays=rays_b, ts=ts_b)
        shared = res[sp.static_from][1] if sp.static_from else None
        r = _dual_pass(params, S, aabb, sp, packs, shared_st=shared)
        dep = (r[1] if r[1] is not None else r[2]).sigma
        res[n] = r
    return res


def train_loss(
    params: Dict[str, Any],
    S: StepStatics,
    aabb: jnp.ndarray,
    data: Dict[str, jnp.ndarray],
    ray_idx: jnp.ndarray,
    ray_idx_rand: jnp.ndarray,
    key: jax.Array,
    sc: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full loss assembly (reference: train.py:1032-2311). Returns
    (total_loss, metrics)."""
    H, W, T = S.H, S.W, S.n_cams
    it = sc["iteration"].astype(jnp.float32)
    wts = S.weights
    metrics: Dict[str, jnp.ndarray] = {}

    # Lambda annealing (train.py:1033-1036).
    Temp_static = 10.0 ** (-(it / 100000.0))
    Temp = 10.0 ** (-jnp.floor(it / 100000.0))
    Temp_disp_TV = 10.0 ** (-jnp.floor(it / 50000.0))

    # iteration-gated loss switches (train.py:1248, 1339), traced so the step
    # compiles once.
    after_u0 = (it >= S.upsamp0).astype(jnp.float32)
    after_u3 = (it >= S.upsamp3).astype(jnp.float32)

    # camera state
    if S.optimize_focal:
        focal = focal_from_fov(params["fov"][0, 0], H, W)
    else:
        focal = sc["focal_fixed"]
    poses_mtx = pose_to_mtx(params["pose"])  # [T, 3, 4]

    # fused gather tables, built ONCE per step and shared by every pass
    # (construction + its VJP run once instead of once per field eval)
    packs = (
        stat_field.pack_tables(params["static"], S.static_cfg),
        dyn_field.pack_tables(params["dynamic"], S.dynamic_cfg),
    )

    # assert (not infer) the data-parallel partitioning of the ray batch:
    # every per-ray tensor downstream inherits a sharding GSPMD cannot
    # silently drop (SURVEY §5.8; constraints are no-ops off-mesh)
    if S.mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        _ray_sh = NamedSharding(S.mesh, PartitionSpec("data"))
        ray_idx = jax.lax.with_sharding_constraint(ray_idx, _ray_sh)
        ray_idx_rand = jax.lax.with_sharding_constraint(ray_idx_rand, _ray_sh)

    # batch gather (device-resident dataset)
    rgb_train = data["rgbs"][ray_idx]
    ts_train = data["ts"][ray_idx]
    flow_f = data["flows_f"][ray_idx]
    mask_f = data["flow_masks_f"][ray_idx][..., None]
    flow_b = data["flows_b"][ray_idx]
    mask_b = data["flow_masks_b"][ray_idx][..., None]
    fg_mask = data["fg_masks"][ray_idx]
    disps_train = data["disps"][ray_idx] if S.use_disp else None
    ts_rand = data["ts"][ray_idx_rand]

    rays_train, i_px, j_px, view_ids = _rays_from_idx(ray_idx, poses_mtx, focal, S)
    if S.mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        rays_train = jax.lax.with_sharding_constraint(
            rays_train, NamedSharding(S.mesh, PartitionSpec("data", None))
        )
    grid_train = jnp.stack([i_px, j_px], -1).astype(jnp.float32)  # (train.py:983-988)

    t_ref = ray_idx // (H * W)
    u_ref = (ray_idx % (H * W)) // W
    v_ref = (ray_idx % (H * W)) % W
    t_interval = 2.0 / (T - 1)

    poses_f = jnp.concatenate([poses_mtx[1:], poses_mtx[-1:]], 0)[t_ref]
    poses_b = jnp.concatenate([poses_mtx[0:1], poses_mtx[:-1]], 0)[t_ref]

    keys = jax.random.split(key, 8)
    total = 0.0

    # ---------------- pass geometry: every ray set, hoisted (the reference
    # computes these interleaved with the losses; hoisting is math-identical
    # and lets all passes share batched field evaluations)
    rays_det = sg(rays_train)
    focal_det = sg(focal)
    uv_base = jnp.stack([v_ref + 0.5, u_ref + 0.5], -1).astype(jnp.float32)
    uv_f = uv_base + flow_f  # (train.py:1433-1436)
    rays_f = _rays_from_uv(uv_f, sg(poses_f), focal_det, S)
    uv_b = uv_base + flow_b
    rays_b = _rays_from_uv(uv_b, sg(poses_b), focal_det, S)

    def _spec(rays, ts, k, detach, mode="dual"):
        ks, kc = (None, None) if S.golden_det else tuple(jax.random.split(k))
        return PassSpec(rays, ts, ks, kc, detach, mode)

    # A: training rays detached (train.py:1092-1162); B: novel time (1166);
    # C/D: flow-warped neighbors (1431-1625) — their losses consume only
    # weights_d + sampler points, so the static field is skipped ("dyn");
    # E: non-detached (1755-1823) — its losses consume only the static-side
    # compositor outputs, so the dynamic field is skipped ("stat_out")
    specs = {
        "A": _spec(rays_det, ts_train, keys[0], True),
        "B": _spec(rays_det, ts_rand, keys[1], True),
        "C": _spec(sg(rays_f), ts_train + t_interval, keys[2], True, "dyn"),
        "D": _spec(sg(rays_b), ts_train - t_interval, keys[3], True, "dyn"),
        "E": _spec(rays_train, ts_train, keys[4], False, "stat_out"),
    }
    if S.share_forward:
        # one sample set for the train-ray passes: E samples live (pose/focal
        # grads flow through xyz), A/B consume it detached; A/B reuse E's
        # static eval (see PassSpec.static_from). Jitter comes from pass A's
        # key; each pass keeps its own white-fill coin.
        samp_live = sample_xyz(
            rays_train, S.n_samples, S.ray_type, S.static_cfg.near_far, aabb,
            S.step_size, specs["A"].k_samp, det_jitter=S.golden_det,
        )
        samp_det = jax.tree_util.tree_map(sg, samp_live)
        specs["A"] = specs["A"]._replace(samp=samp_det, static_from="E")
        specs["B"] = specs["B"]._replace(samp=samp_det, static_from="E")
        specs["E"] = specs["E"]._replace(samp=samp_live)
    if S.optimize_poses:
        # FF/BB: static disparity passes with NON-detached pose/focal
        # (train.py:1960-2094); F/G: pixel-neighbor duals (2123-2311)
        rays_f_nd = _rays_from_uv(uv_base + flow_f, poses_f, focal, S)
        rays_b_nd = _rays_from_uv(uv_base + flow_b, poses_b, focal, S)
        k5a, k5b = (None, None) if S.golden_det else tuple(jax.random.split(keys[5]))
        i_n = jnp.clip(i_px + 1, None, W - 1)
        j_n = jnp.clip(j_px + 1, None, H - 1)
        poses_per_ray = poses_mtx[view_ids]

        def _neighbor_rays(ii, jj):
            dirs = get_ray_directions_lean(ii, jj, (focal, focal), (W / 2, H / 2))
            ro, rd = get_rays_lean(dirs, poses_per_ray)
            if S.ray_type == "ndc":
                ro, rd = ndc_rays_blender(H, W, (focal, focal), 1.0, ro, rd)
            return jnp.concatenate([ro, rd], -1)

        specs["F"] = _spec(_neighbor_rays(i_n, j_px), ts_train, keys[6], False, "stat_out")
        specs["G"] = _spec(_neighbor_rays(i_px, j_n), ts_train, keys[7], False, "stat_out")
        specs["FF"] = PassSpec(rays_f_nd, ts_train, k5a, None, False, "stat")
        specs["BB"] = PassSpec(rays_b_nd, ts_train, k5b, None, False, "stat")

    # -------- train-time occupancy mask (+ optional [R, K] compaction) ----
    # (StepStatics.use_alpha_mask / compact_k docstrings; the trainer turns
    # these on once update_AlphaMask_list fires with --compact_train)
    sf_pts_dense = None  # pass A's dense pre-compaction points + selection —
    sf_idx = None        # the scene-flow regularizers keep the dense domain
    if S.use_alpha_mask:
        K = S.compact_k
        done = set()
        if S.share_forward:
            # shared train-ray geometry: ONE selection for A/B/E from the
            # union of their per-time occupancies (keeps A/B's reuse of E's
            # static eval exact; a superset of per-pass masking)
            xyz_sh, z_sh, valid_sh = samp_live
            occ_u = _occupancy(
                data, xyz_sh, ts_train, valid_sh, S.alpha_shape
            ) | _occupancy(data, xyz_sh, ts_rand, valid_sh, S.alpha_shape)
            if K > 0:
                samp_m, idx_sh = _compact_samp(
                    xyz_sh, z_sh, occ_u, rays_train, S.ray_type, K
                )
                sf_pts_dense, sf_idx = sg(xyz_sh), idx_sh
            else:
                samp_m = (xyz_sh, z_sh, occ_u)
            specs["E"] = specs["E"]._replace(samp=samp_m)
            samp_m_det = jax.tree_util.tree_map(sg, samp_m)
            specs["A"] = specs["A"]._replace(samp=samp_m_det)
            specs["B"] = specs["B"]._replace(samp=samp_m_det)
            done |= {"A", "B", "E"}
        for n in list(specs):
            if n in done:
                continue
            sp = specs[n]
            xyz_p, z_p, v_p = (
                sp.samp
                if sp.samp is not None
                else sample_xyz(
                    sp.rays, S.n_samples, S.ray_type, S.static_cfg.near_far,
                    aabb, S.step_size, sp.k_samp, det_jitter=S.golden_det,
                )
            )
            occ_p = _occupancy(data, xyz_p, sp.ts, v_p, S.alpha_shape)
            if K > 0:
                samp_m, idx_p = _compact_samp(
                    xyz_p, z_p, occ_p, sp.rays, S.ray_type, K
                )
                if n == "A":  # share_forward off: A owns its geometry
                    sf_pts_dense, sf_idx = xyz_p, idx_p
            else:
                samp_m = (xyz_p, z_p, occ_p)
            specs[n] = sp._replace(samp=samp_m)

    res = _run_passes(params, S, aabb, specs, packs)
    outA, stA, dnA, _ = res["A"]
    outB, stB, dnB, _ = res["B"]

    # skewed mask + novel mask losses (train.py:1248-1273), gated on upsamp3
    skewed_rand = L.skewed_entropy(outB.dynamicness)
    novel_mask = jnp.mean(jnp.abs(outB.dynamicness))
    total += after_u3 * 0.01 * (skewed_rand + novel_mask)
    metrics["skewed_mask_loss_rand"] = skewed_rand
    metrics["novel_view_time_mask_loss"] = novel_mask

    # novel adaptive order loss (train.py:1276-1292)
    novel_order = L.adaptive_order_loss(
        outB.depth_d, sg(outB.depth_s), sg(outB.dynamicness), S.ray_type
    )
    total += novel_order * 10.0
    metrics["novel_order_loss"] = novel_order

    # novel-time distortion (train.py:1299-1311); the 1/nS interval is the
    # DENSE sampler spacing (reference passes 1/nSamples) — under compaction
    # the weights axis is K but the spacing is unchanged
    if wts.distortion_dynamic > 0:
        dist_rand = eff_distloss(outB.weights_d, sg(dnB.z_vals), 1.0 / S.n_samples)
        total += dist_rand * wts.distortion_dynamic * (it / S.n_iters)
        metrics["loss_distortion_rand"] = dist_rand

    # scene flow at pass-A sample points (train.py:1319-1321). Under
    # compaction the REGULARIZERS (small/smooth, below) keep the reference's
    # dense domain — the flow MLP is cheap, and evaluating it at all S dense
    # points keeps those losses identical to the dense(-masked) step; only
    # the kept-sample subset feeds the induced flows (it must align with the
    # compacted weights_d)
    if sf_idx is not None:
        sf_reg_f, sf_reg_b = dyn_field.scene_flow(
            params["dynamic"], sf_pts_dense, ts_train, aabb
        )
        scene_flow_f = jnp.take_along_axis(sf_reg_f, sf_idx[..., None], axis=1)
        scene_flow_b = jnp.take_along_axis(sf_reg_b, sf_idx[..., None], axis=1)
    else:
        scene_flow_f, scene_flow_b = dyn_field.scene_flow(
            params["dynamic"], dnA.pts_ref, ts_train, aabb
        )
        sf_reg_f, sf_reg_b = scene_flow_f, scene_flow_b

    # RGB losses (train.py:1323-1335)
    img_loss = L.mse(outA.rgb_full, rgb_train)
    total += 3.0 * img_loss
    metrics["mse"] = img_loss
    metrics["psnr"] = -10.0 * jnp.log(img_loss) / jnp.log(10.0)

    img_d_loss = L.mse(outA.rgb_d, rgb_train)
    total += 1.0 * img_d_loss
    metrics["img_d_loss"] = img_d_loss

    # mask loss (train.py:1339-1347), gated on upsamp0
    mask_loss = jnp.mean(jnp.abs(outA.dynamicness - fg_mask))
    total += after_u0 * 0.1 * mask_loss * Temp_disp_TV
    metrics["mask_loss"] = mask_loss

    # skewed mask + L1 on training time (train.py:1349-1371), gated on upsamp3
    skewed = L.skewed_entropy(outA.dynamicness)
    mask_l1 = jnp.mean(jnp.abs(outA.dynamicness))
    total += after_u3 * 0.01 * (skewed + mask_l1)
    metrics["skewed_mask_loss"] = skewed
    metrics["mask_L1_reg_loss"] = mask_l1

    # displaced points (train.py:1373-1378)
    if S.ray_type == "ndc":
        pts_f = dnA.pts_ref + scene_flow_f
        pts_b = dnA.pts_ref + scene_flow_b
    else:
        pts_f = jnp.clip(dnA.pts_ref + scene_flow_f, -2.0 + 1e-6, 2.0 - 1e-6)
        pts_b = jnp.clip(dnA.pts_ref + scene_flow_b, -2.0 + 1e-6, 2.0 - 1e-6)

    # induced flow losses (train.py:1380-1419); focal detached here
    induced_flow_f, induced_disp_f = induce_flow(
        H, W, focal_det, sg(poses_f), outA.weights_d, pts_f, grid_train, rays_det, S.ray_type
    )
    flow_f_loss = L.masked_l1_mean(jnp.abs(induced_flow_f - flow_f), mask_f, 2.0)
    induced_flow_b, induced_disp_b = induce_flow(
        H, W, focal_det, sg(poses_b), outA.weights_d, pts_b, grid_train, rays_det, S.ray_type
    )
    flow_b_loss = L.masked_l1_mean(jnp.abs(induced_flow_b - flow_b), mask_b, 2.0)
    total += 0.02 * (flow_f_loss + flow_b_loss) * Temp
    metrics["flow_f_loss"] = flow_f_loss
    metrics["flow_b_loss"] = flow_b_loss

    # small scene flow (train.py:1421-1429) — dense domain (see above)
    small_sf = jnp.mean(jnp.abs(sf_reg_f)) + jnp.mean(jnp.abs(sf_reg_b))
    total += wts.small_scene_flow * small_sf
    metrics["small_scene_flow_loss"] = small_sf

    # ------------- PASS C/D: flow-warped neighbor rays (train.py:1431-1625)
    outC, _, dnC, _ = res["C"]
    _, induced_disp_ff = induce_flow(
        H, W, focal_det, sg(poses_f), outC.weights_d, dnC.pts_ref, grid_train, sg(rays_f), S.ray_type
    )
    disp_f_loss = L.masked_l1_mean(jnp.abs(induced_disp_f - induced_disp_ff), mask_f)
    total += 0.04 * disp_f_loss * Temp
    metrics["disp_f_loss"] = disp_f_loss

    outD, _, dnD, _ = res["D"]
    _, induced_disp_bb = induce_flow(
        H, W, focal_det, sg(poses_b), outD.weights_d, dnD.pts_ref, grid_train, sg(rays_b), S.ray_type
    )
    disp_b_loss = L.masked_l1_mean(jnp.abs(induced_disp_b - induced_disp_bb), mask_b)
    total += 0.04 * disp_b_loss * Temp
    metrics["disp_b_loss"] = disp_b_loss

    # smooth scene flow (train.py:1627-1633) — dense domain (see above)
    smooth_sf = jnp.mean(jnp.abs(sf_reg_f + sf_reg_b))
    total += wts.smooth_scene_flow * smooth_sf
    metrics["smooth_scene_flow_loss"] = smooth_sf

    # monodepth dynamic (train.py:1635-1659)
    if S.use_disp:
        if S.ray_type == "ndc":
            md = L.monodepth_loss(outA.depth_d, -disps_train, t_ref, T)
        else:
            md = L.monodepth_loss(1.0 / (outA.depth_d + 1e-6), disps_train, t_ref, T)
        total += md * wts.monodepth_dynamic * Temp
        metrics["total_mono_depth_loss_dynamic"] = md

    # adaptive order loss (train.py:1666-1680)
    order = L.adaptive_order_loss(outA.depth_d, sg(outA.depth_s), sg(outA.dynamicness), S.ray_type)
    total += order * 10.0
    metrics["order_loss"] = order

    # dynamic distortion over A/C/D (train.py:1685-1711); dense 1/nS spacing
    if wts.distortion_dynamic > 0:
        nS = S.n_samples
        dist = (
            eff_distloss(outA.weights_d, sg(dnA.z_vals), 1.0 / nS)
            + eff_distloss(outC.weights_d, sg(dnC.z_vals), 1.0 / nS)
            + eff_distloss(outD.weights_d, sg(dnD.z_vals), 1.0 / nS)
        )
        total += dist * wts.distortion_dynamic * (it / S.n_iters)
        metrics["loss_distortion"] = dist

    # grid regularizers, dynamic field (train.py:1718-1753)
    if wts.ortho > 0:
        ortho = line_orthogonality(params["dynamic"]["density_line"]) + line_orthogonality(
            params["dynamic"]["app_line"]
        )
        total += wts.ortho * ortho
        metrics["reg"] = ortho
    if wts.l1 > 0:
        l1d = dyn_field.density_l1(params["dynamic"], S.dynamic_cfg)
        total += wts.l1 * l1d
        metrics["loss_reg_L1_density"] = l1d
    tv_mult = S.lr_factor ** (it + 1.0)  # (train.py:1735: *= lr_factor before use)
    if wts.tv_density > 0:
        tvd = dyn_field.tv_density(params["dynamic"]) + dyn_field.tv_blending(params["dynamic"])
        total += wts.tv_density * tv_mult * tvd
        metrics["reg_tv_density"] = tvd
    if wts.tv_app > 0:
        tva = dyn_field.tv_app(params["dynamic"])
        total += wts.tv_app * tv_mult * tva
        metrics["reg_tv_app"] = tva

    # ------------- PASS E: non-detached rays -> static + camera gradients
    # (train.py:1755-1823)
    outE, stE, dnE, z_vals_E = res["E"]

    # static RGB on background pixels (train.py:1827-1835)
    bg = 1.0 - fg_mask[..., None]
    img_s_loss = jnp.sum(((outE.rgb_s - rgb_train) ** 2) * bg) / (jnp.sum(bg) + 1e-8) / 3.0
    total += 1.0 * img_s_loss
    metrics["img_s_loss"] = img_s_loss

    # static distortion (train.py:1841-1856); dense 1/nS spacing
    if wts.distortion_static > 0:
        dist_s = eff_distloss(outE.weights_s, z_vals_E, 1.0 / S.n_samples)
        total += dist_s * wts.distortion_static * (it / S.n_iters)
        metrics["loss_distortion_static"] = dist_s

    # static regs (train.py:1863-1887)
    if wts.l1 > 0:
        l1s = stat_field.density_l1(params["static"], S.static_cfg)
        total += wts.l1 * l1s
        metrics["loss_reg_L1_density_s"] = l1s
    if wts.tv_density > 0:
        tvs = stat_field.tv_density(params["static"])
        total += wts.tv_density * tv_mult * tvs
        metrics["reg_tv_density_static"] = tvs
    if wts.tv_app > 0:
        tvas = stat_field.tv_app(params["static"])
        total += wts.tv_app * tv_mult * tvas
        metrics["reg_tv_app_static"] = tvas

    if S.optimize_poses:
        # static motion losses (train.py:1895-1958); focal NOT detached
        induced_flow_f_s, induced_disp_f_s = induce_flow(
            H, W, focal, poses_f, outE.weights_s, stE.pts_ref, grid_train, rays_train, S.ray_type
        )
        comb_f = mask_f * bg
        flow_f_s = L.masked_l1_mean(jnp.abs(induced_flow_f_s - flow_f), comb_f, 2.0)
        induced_flow_b_s, induced_disp_b_s = induce_flow(
            H, W, focal, poses_b, outE.weights_s, stE.pts_ref, grid_train, rays_train, S.ray_type
        )
        comb_b = mask_b * bg
        flow_b_s = L.masked_l1_mean(jnp.abs(induced_flow_b_s - flow_b), comb_b, 2.0)
        total += 0.02 * (flow_f_s + flow_b_s) * Temp_static
        metrics["flow_f_s_loss"] = flow_f_s
        metrics["flow_b_s_loss"] = flow_b_s

        # static disparity consistency via flow-warped rays, static-field-only
        # passes (train.py:1960-2094)
        stFF = res["FF"][1]
        _, induced_disp_s_ff = induce_flow(
            H, W, focal, poses_f, stFF.weights, stFF.pts_ref, grid_train, rays_f_nd, S.ray_type
        )
        disp_f_s = L.masked_l1_mean(jnp.abs(induced_disp_f_s - induced_disp_s_ff), comb_f)
        total += 0.04 * disp_f_s * Temp_static
        metrics["disp_f_s_loss"] = disp_f_s

        stBB = res["BB"][1]
        _, induced_disp_s_bb = induce_flow(
            H, W, focal, poses_b, stBB.weights, stBB.pts_ref, grid_train, rays_b_nd, S.ray_type
        )
        disp_b_s = L.masked_l1_mean(jnp.abs(induced_disp_b_s - induced_disp_s_bb), comb_b)
        total += 0.04 * disp_b_s * Temp_static
        metrics["disp_b_s_loss"] = disp_b_s

        # static monodepth, background-only (train.py:2096-2116)
        if S.use_disp:
            bg_valid = fg_mask < 0.5
            if S.ray_type == "ndc":
                md_s = L.monodepth_loss(outE.depth_s, -disps_train, t_ref, T, bg_valid)
            else:
                md_s = L.monodepth_loss(1.0 / (outE.depth_s + 1e-6), disps_train, t_ref, T, bg_valid)
            total += md_s * wts.monodepth_static * Temp_static
            metrics["total_mono_depth_loss_static"] = md_s

        # ---------- PASS F/G: pixel-neighbor rays (train.py:2123-2311)
        depth_s_i = res["F"][0].depth_s
        depth_s_j = res["G"][0].depth_s
        smooth = L.disp_smooth_loss(outE.depth_s, depth_s_i, depth_s_j)
        total += smooth * 50.0 * Temp_disp_TV
        metrics["disp_smooth_loss"] = smooth

    metrics["total_loss"] = total
    metrics["focal"] = focal
    return total, metrics


# ---------------------------------------------------------------------------
# Optimizer plumbing: one shared Adam(0.9, 0.99) moment state per partition
# (fields / pose / focal), per-leaf learning rates applied outside the
# transform so runtime lr scalars never retrace (reference: train.py:934,
# 991-1009, 2350-2351, 2589-2610).
# ---------------------------------------------------------------------------

ADAM = optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-8)
# pose/focal Adams use torch defaults — the reference constructs them without
# betas (train.py:993, 1002), unlike the field optimizer's (0.9, 0.99)
ADAM_POSE = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def is_spatial(path) -> bool:
    """Plane/line params get lr_init (0.02); everything else lr_basis (0.001)
    (reference: tensoRF.py:49-61, 352-376 get_optparam_groups)."""
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    return any(("plane" in str(n) or "line" in str(n)) for n in names)


def init_opt_state(params):
    return {
        "fields": ADAM.init({"static": params["static"], "dynamic": params["dynamic"]}),
        "pose": ADAM_POSE.init(params["pose"]),
        "fov": ADAM_POSE.init(params["fov"]),
    }


def apply_updates(params, grads, opt_state, sc):
    """Adam + per-group lr; lr scalars come from the host schedule."""
    field_params = {"static": params["static"], "dynamic": params["dynamic"]}
    field_grads = {"static": grads["static"], "dynamic": grads["dynamic"]}
    upd_f, new_fields_state = ADAM.update(field_grads, opt_state["fields"], field_params)
    lr_sp, lr_net = sc["lr_spatial"], sc["lr_network"]
    upd_f = jax.tree_util.tree_map_with_path(
        lambda path, u: -(lr_sp if is_spatial(path) else lr_net) * u, upd_f
    )
    new_field_params = optax.apply_updates(field_params, upd_f)

    upd_p, new_pose_state = ADAM_POSE.update(grads["pose"], opt_state["pose"], params["pose"])
    new_pose = params["pose"] - sc["lr_pose"] * upd_p

    upd_v, new_fov_state = ADAM_POSE.update(grads["fov"], opt_state["fov"], params["fov"])
    new_fov = params["fov"] - sc["lr_focal"] * upd_v

    new_params = {
        "static": new_field_params["static"],
        "dynamic": new_field_params["dynamic"],
        "pose": new_pose,
        "fov": new_fov,
    }
    new_state = {"fields": new_fields_state, "pose": new_pose_state, "fov": new_fov_state}
    return new_params, new_state


def make_train_step(S: StepStatics, donate: bool = True):
    """Build the jitted step: (params, opt_state, aabb, data, ray_idx,
    ray_idx_rand, key, sc) -> (params, opt_state, metrics).

    S.grad_accum > 1 splits the ray batch into equal micro-batches and
    accumulates their gradients in a lax.scan before the single optimizer
    update. Per-ray mean losses and param-level regularizers average
    exactly to the full-batch gradient; the batch-STATISTIC terms — the
    monodepth loss's median/MAD normalization (losses.py, reference
    train.py:1635-1658) and the flow losses' mask-sum ratios — are
    computed per micro-batch and averaged: the same estimator at micro
    sample size (measured 2e-4 relative loss shift at 1024->2x512;
    tests/test_grad_accum.py). The scan body compiles once and its buffers
    are reused across micro-batches — a structural (scheduler-independent)
    bound on live eval memory that the 640^3 schedule needs on a 16 GB
    chip."""

    def grad_of(params, aabb, data, ri, rr, key, sc):
        return jax.value_and_grad(
            lambda p: train_loss(p, S, aabb, data, ri, rr, key, sc),
            has_aux=True,
        )(params)

    def grads_and_metrics(params, aabb, data, ray_idx, ray_idx_rand, key, sc):
        A = max(1, int(S.grad_accum))
        if A == 1:
            (_, metrics), grads = grad_of(
                params, aabb, data, ray_idx, ray_idx_rand, key, sc
            )
        else:
            ri = ray_idx.reshape(A, -1)
            rr = ray_idx_rand.reshape(A, -1)
            keys = jax.random.split(key, A)

            def body(acc, inp):
                g_acc, m_acc = acc
                ri_i, rr_i, k_i = inp
                (_, m), g = grad_of(params, aabb, data, ri_i, rr_i, k_i, sc)
                g_acc = jax.tree_util.tree_map(
                    lambda a, b: a + b / float(A), g_acc, g
                )
                m_acc = jax.tree_util.tree_map(
                    lambda a, b: a + b / float(A), m_acc, m
                )
                return (g_acc, m_acc), None

            # zero-init accumulators from abstract shapes so every micro
            # runs inside the scan: ONE compiled body, buffers reused
            (_, m_sh), g_sh = jax.eval_shape(
                grad_of, params, aabb, data, ri[0], rr[0], keys[0], sc
            )
            zeros = lambda tree: jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), tree
            )
            (grads, metrics), _ = jax.lax.scan(
                body, (zeros(g_sh), zeros(m_sh)), (ri, rr, keys)
            )
        return grads, metrics

    def step(params, opt_state, aabb, data, ray_idx, ray_idx_rand, key, sc):
        grads, metrics = grads_and_metrics(
            params, aabb, data, ray_idx, ray_idx_rand, key, sc
        )
        new_params, new_state = apply_updates(params, grads, opt_state, sc)
        return new_params, new_state, metrics

    donate_argnums = (0, 1) if donate else ()
    out = jax.jit(step, donate_argnums=donate_argnums)
    out.grads_and_metrics = grads_and_metrics  # exposed for parity tests
    return out
