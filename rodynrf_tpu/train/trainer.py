"""Trainer: owns params, optimizer state, schedules, and the jitted step.

The orchestration equivalent of the reference's `reconstruction()`
(reference: train.py:824-2658), factored into a real class. The hot loop is
one compiled step; Python only gathers batch indices, advances schedules, and
handles the ≤7 upsample recompiles.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FieldConfig, cal_n_samples, n_to_reso
from ..fields.dynamic import init_dynamic_field, upsample_dynamic_field
from ..fields.static import init_static_field, upsample_static_field
from ..data.scene import SceneData, default_focal
from .schedule import LrSchedule, PermutationSampler, n_voxel_schedule
from .step import LossWeights, StepStatics, init_opt_state, make_train_step


def init_pose_params(scene: SceneData, n_cams: int) -> np.ndarray:
    """6D-rotation + translation per frame (reference: train.py:964-973)."""
    init = np.zeros((n_cams, 9), np.float32)
    if scene.poses is not None:
        init[:, 0:3] = scene.poses[:, :, 0]
        init[:, 3:6] = scene.poses[:, :, 1]
        init[:, 6:9] = scene.poses[:, :, 3]
    else:
        init[:, 0] = 1.0
        init[:, 4] = 1.0
    return init


class Trainer:
    def __init__(self, args, scene: SceneData, key: Optional[jax.Array] = None):
        self.args = args
        self.scene = scene
        self.key = key if key is not None else jax.random.PRNGKey(args.seed)

        W, H = scene.img_wh
        self.H, self.W = H, W
        self.aabb = jnp.asarray(scene.scene_bbox)

        reso_cur = n_to_reso(args.N_voxel_init, scene.scene_bbox)
        self.n_samples = min(args.nSamples, cal_n_samples(reso_cur, args.step_ratio))

        common = dict(
            t_size=args.N_voxel_t,
            density_n_comp=tuple(args.n_lamb_sigma),
            app_n_comp=tuple(args.n_lamb_sh),
            app_dim=args.data_dim_color,
            density_shift=args.density_shift,
            alpha_mask_thres=args.alpha_mask_thre,
            distance_scale=args.distance_scale,
            ray_march_weight_thres=args.rm_weight_mask_thre,
            fea2dense_act=args.fea2denseAct,
            near_far=tuple(scene.near_far),
            step_ratio=args.step_ratio,
            pos_pe=args.pos_pe,
            view_pe=args.view_pe,
            featureC=args.featureC,
            grid_sample_dtype="bfloat16" if getattr(args, "bf16", 0) else "float32",
            vm_layout=getattr(args, "vm_layout", "auto"),
            grad_impl=getattr(args, "grad_impl", "autodiff"),
        )
        # static model uses fea_pe=2, dynamic fea_pe=0 (train.py:889, 918)
        self.static_cfg = FieldConfig(
            grid_size=reso_cur, shading_mode=args.shadingModeStatic, fea_pe=2, **common
        )
        self.dynamic_cfg = FieldConfig(
            grid_size=reso_cur, shading_mode=args.shadingMode, fea_pe=0, **common
        )

        k1, k2, self.key = jax.random.split(self.key, 3)
        self.params = {
            "static": init_static_field(k1, self.static_cfg),
            "dynamic": init_dynamic_field(k2, self.dynamic_cfg),
            "pose": jnp.asarray(init_pose_params(scene, args.N_voxel_t)),
            "fov": jnp.full((1, 1), 30.0 / 180.0 * np.pi, jnp.float32),
        }
        self.opt_state = init_opt_state(self.params)

        if args.lr_decay_iters > 0:
            lr_factor = args.lr_decay_target_ratio ** (1.0 / args.lr_decay_iters)
        else:
            lr_factor = args.lr_decay_target_ratio ** (1.0 / args.n_iters)
        self.lr_factor = lr_factor

        self.schedule = LrSchedule(
            lr_init=args.lr_init,
            lr_basis=args.lr_basis,
            lr_factor=lr_factor,
            n_iters=args.n_iters,
            upsamp_list=list(args.upsamp_list),
            optimize_poses=bool(args.optimize_poses),
            optimize_focal=bool(args.optimize_focal_length),
            lr_upsample_reset=bool(args.lr_upsample_reset),
            lr_decay_target_ratio=args.lr_decay_target_ratio,
        )
        self.n_voxel_list = n_voxel_schedule(
            args.N_voxel_init, args.N_voxel_final, len(args.upsamp_list)
        )

        self.sampler = PermutationSampler(scene.n_rays, args.batch_size, args.seed)
        self.sampler2 = PermutationSampler(scene.n_rays, args.batch_size, args.seed + 1)

        self.data = jax.tree_util.tree_map(jnp.asarray, scene.device_arrays())
        self.focal_fixed = float(scene.focal if scene.focal is not None else default_focal(W, H))

        # data-parallel placement over rays (parallel/mesh.py): params and
        # dataset replicated, ray batches sharded; no-op on one device
        n_dev = args.n_devices if args.n_devices > 0 else jax.device_count()
        self.mesh = None
        if n_dev > 1:
            # non-divisible batches shard over the largest divisor sub-mesh
            # (no padding: uneven tiled intermediates trip an XLA SPMD
            # partitioner CHECK in the pose-gradient scatter; loss values
            # stay exactly single-device)
            import math

            d = math.gcd(args.batch_size, n_dev)
            if d != n_dev:
                msg = (
                    f"[parallel] batch_size {args.batch_size} does not divide "
                    f"{n_dev} devices; sharding rays over {d} device(s)"
                )
                if d * 2 <= n_dev:
                    import warnings

                    warnings.warn(
                        msg + f" — {n_dev - d} of {n_dev} devices will sit IDLE. "
                        "Pick a batch_size divisible by the device count.",
                        stacklevel=2,
                    )
                else:
                    print(msg)
            n_dev = d
        if n_dev > 1:
            from ..parallel import global_mesh, make_mesh, shard_train_inputs

            # multi-host pods: one mesh over every process's devices; the
            # input pipeline feeds per-process shards (parallel/multihost.py)
            use_global = jax.process_count() > 1 and n_dev == jax.device_count()
            self.mesh = global_mesh() if use_global else make_mesh(n_dev)
            self.params, self.opt_state, self.aabb, self.data = shard_train_inputs(
                self.mesh, self.params, self.opt_state, self.aabb, self.data,
                shard_grids=bool(getattr(args, "shard_grids", 0)),
            )

        self.iteration = 0
        self.metrics_history = []
        # occupancy mask built at update_AlphaMask_list iterations (the
        # reference PARSES this flag but never reads it, opt.py:211 — here
        # it is functional); feeds the eval/render early-out and — with
        # --compact_train — the train step's [R, K] sample compaction
        # (StepStatics.use_alpha_mask/compact_k); persisted in checkpoints
        self.alpha_mask = None
        # train-time compaction: per-ray occupied-bucket size (0 = dense);
        # sized by _probe_compact_k once update_alpha_mask fires
        self.compact_k = 0
        # flat-bucket slots per ray for the field evals (0 = [R, K] dense
        # evals); see StepStatics.compact_flat
        self.compact_flat = 0
        # static dims of the FLAT data["alpha_volume"] (StepStatics.alpha_shape)
        self.alpha_shape = ()
        # golden-comparison hook: callable(iteration) -> (ray_idx, ray_idx_rand)
        # replacing the permutation samplers with an externally recorded stream
        self.sampler_override = None
        if getattr(args, "ckpt", None):
            self._resume(args.ckpt)
            if self.alpha_mask is not None and bool(getattr(args, "compact_train", 0)):
                self._enable_train_compaction()
        self._refresh_app_frac()
        self._build_step()

    def save_full(self, path: str):
        """Write a FULL training checkpoint: params, Adam moments, PRNG key,
        and both samplers' states — a resumed run continues the exact same
        trajectory (the reference's resume restarts the static model and all
        optimizers, train.py:896-901; this is strictly stronger)."""
        from .checkpoints import save_checkpoint

        def adam_to_dict(st):
            # optax chains wrap state in a tuple; scale_by_adam state is
            # (count, mu, nu)
            s = st[0] if isinstance(st, tuple) and not hasattr(st, "mu") else st
            return {"count": s.count, "mu": s.mu, "nu": s.nu}

        tree = {
            "params": {k: self.params[k] for k in ("static", "dynamic", "pose", "fov")},
            "opt": {k: adam_to_dict(v) for k, v in self.opt_state.items()},
            "rng_key": self.key,
            "sampler_ids": np.asarray(
                self.sampler.ids if self.sampler.ids is not None else np.zeros(0, np.int64)
            ),
            "sampler2_ids": np.asarray(
                self.sampler2.ids if self.sampler2.ids is not None else np.zeros(0, np.int64)
            ),
        }
        extra = {
            "iteration": self.iteration,
            "full_state": True,
            "sampler_curr": int(self.sampler.curr),
            "sampler2_curr": int(self.sampler2.curr),
            "sampler_rng": self.sampler.rng.bit_generator.state,
            "sampler2_rng": self.sampler2.rng.bit_generator.state,
        }
        save_checkpoint(path, tree, self.static_cfg, self.dynamic_cfg,
                        np.asarray(self.aabb), extra=extra)

    def _resume(self, ckpt_path: str):
        """Resume training from a native checkpoint.

        Full checkpoints (Trainer.save_full) restore params, Adam moments,
        PRNG key, and sampler states — bit-exact continuation. Plain
        checkpoints (the CLI's periodic saves) restore params/grids/iteration
        with fresh optimizers, replaying the LR/upsample schedule (still a
        superset of the reference's dynamic-model-only resume,
        train.py:896-901).
        """
        import optax

        from .checkpoints import load_checkpoint

        params, static_cfg, dynamic_cfg, aabb, extra, alpha_mask = load_checkpoint(
            ckpt_path, return_alpha=True
        )
        if alpha_mask is not None:
            self.alpha_mask = alpha_mask
        full = bool(extra.get("full_state"))
        tree = params if not full else params["params"]
        self.params = jax.tree_util.tree_map(jnp.asarray, tree)
        self.static_cfg = static_cfg
        self.dynamic_cfg = dynamic_cfg
        self.aabb = jnp.asarray(aabb)
        self.iteration = int(extra.get("iteration", 0))
        self.n_samples = min(
            self.args.nSamples, cal_n_samples(static_cfg.grid_size, self.args.step_ratio)
        )
        if full:
            def adam_from_dict(d):
                return optax.ScaleByAdamState(
                    count=jnp.asarray(d["count"]),
                    mu=jax.tree_util.tree_map(jnp.asarray, d["mu"]),
                    nu=jax.tree_util.tree_map(jnp.asarray, d["nu"]),
                )
            self.opt_state = {k: adam_from_dict(v) for k, v in params["opt"].items()}
            self.key = jnp.asarray(np.asarray(params["rng_key"], np.uint32))
            for name, samp in (("sampler", self.sampler), ("sampler2", self.sampler2)):
                ids = np.asarray(params[f"{name}_ids"])
                samp.ids = ids if ids.size else None
                samp.curr = int(extra[f"{name}_curr"])
                samp.rng.bit_generator.state = extra[f"{name}_rng"]
        else:
            self.opt_state = init_opt_state(self.params)
        # replay schedule arithmetic up to the resumed iteration (upsample
        # fires at the END of iteration i when i is in upsamp_list, matching
        # reference train.py:2582)
        for i in range(self.iteration):
            self.schedule.after_step(i)
            if i in self.args.upsamp_list:
                if self.n_voxel_list:
                    self.n_voxel_list.pop(0)
                self.schedule.on_upsample(i)

    # ------------------------------------------------------------------
    def _statics(self) -> StepStatics:
        a = self.args
        return StepStatics(
            static_cfg=self.static_cfg,
            dynamic_cfg=self.dynamic_cfg,
            H=self.H,
            W=self.W,
            n_cams=a.N_voxel_t,
            n_samples=self.n_samples,
            ray_type=a.ray_type,
            optimize_poses=bool(a.optimize_poses),
            optimize_focal=bool(a.optimize_focal_length),
            use_disp=bool(a.use_disp),
            white_bg=self.scene.white_bg,
            n_iters=a.n_iters,
            upsamp0=a.upsamp_list[0],
            upsamp3=a.upsamp_list[3] if len(a.upsamp_list) > 3 else a.upsamp_list[-1],
            lr_factor=self.lr_factor,
            weights=LossWeights(
                distortion_static=a.distortion_weight_static,
                distortion_dynamic=a.distortion_weight_dynamic,
                monodepth_static=a.monodepth_weight_static,
                monodepth_dynamic=a.monodepth_weight_dynamic,
                small_scene_flow=a.small_scene_flow_weight,
                smooth_scene_flow=a.smooth_scene_flow_weight,
                l1=a.L1_weight_inital,
                ortho=a.Ortho_weight,
                tv_density=a.TV_weight_density,
                tv_app=a.TV_weight_app,
            ),
            step_size=self.static_cfg.step_size(np.asarray(self.scene.scene_bbox)),
            golden_det=bool(getattr(a, "golden_det", 0)),
            mesh=self.mesh,
            remat=self._remat_policy(),
            fused_passes=bool(getattr(a, "fused_passes", 1)),
            pass_chunk=self._pass_chunk(),
            grad_accum=self._grad_accum(),
            share_forward=bool(getattr(a, "share_forward", 1)),
            use_alpha_mask=self.compact_k > 0,
            compact_k=self.compact_k,
            compact_flat=self.compact_flat,
            alpha_shape=self.alpha_shape,
        )

    def _grad_accum(self) -> int:
        """Micro-batch count (make_train_step): explicit --grad_accum, else
        2 on the 640^3-class phases where even rematerialized sequential
        evals exceed HBM (measured: 15.9-16.5 GB HLO temps at batch 1024)."""
        a = int(getattr(self.args, "grad_accum", 0))
        if a > 0:
            return a
        # measured at 640^3 bf16 batch 1024: accum=2 still OOMs by 169 MB
        # (table-grad scatter buffers are grid-, not batch-, sized); accum=4
        # runs at 1,867 ms/step
        need = 4 if int(self.args.N_voxel_final) > 500 ** 3 else 1
        while int(self.args.batch_size) % (need * max(1, self.mesh.size if self.mesh else 1)):
            need += 1  # micro size must stay device-divisible
        return need

    def _gather_row_bytes(self) -> tuple:
        """(per-pass dynamic-eval gathered-row bytes, per-pass static) —
        the dominant HBM temps: 12 corner rows (3 orientations x 4 corners)
        x packed channels per sample, density+blending dense, appearance
        scaled by the compaction top-K fraction. Uses the EFFECTIVE per-ray
        sample count (compact_k when train-time compaction is active)."""
        S = self.compact_k if self.compact_k else self.n_samples
        B = int(self.args.batch_size)
        dt = 2 if self.dynamic_cfg.grid_sample_dtype == "bfloat16" else 4
        k = self.dynamic_cfg.app_topk(S)
        app_f = (k / S) if 0 < k < S else 1.0
        c_dyn = 3 * (  # 3 multiscale strides
            sum(self.dynamic_cfg.density_n_comp) * 2  # density + blending
            + sum(self.dynamic_cfg.app_n_comp) * app_f
        )
        c_st = sum(self.static_cfg.density_n_comp) + sum(
            self.static_cfg.app_n_comp
        ) * app_f
        return B * S * 12 * c_dyn * dt, B * S * 12 * c_st * dt

    def _pass_chunk(self) -> int:
        """Max dual passes per batched dynamic field eval: one eval's take
        output + masked copy must fit a ~8 GB live-temp budget (measured at
        300^3 dense bf16: 4 passes/chunk OOMs by 70 MB -> 3 fits; 7 f32
        passes at 18.7 GB OOM)."""
        per_pass, _ = self._gather_row_bytes()
        return max(1, int(8e9 // max(per_pass, 1)))

    def _remat_policy(self) -> bool:
        """'auto' stores backward activations when they fit HBM (measured:
        ~25% faster) and rematerializes the field evals otherwise.

        The dominant residuals are the gathered corner rows of the batched
        field evals (fused_vm take output plus its masked copy): per sample,
        12 rows (3 orientations x 4 corners) x the packed channel count —
        density + blending on every sample, appearance scaled by the
        compaction fraction. The byte estimate below, x0.65 (XLA does not
        keep every eval's rows live simultaneously; calibrated against the
        measured 15.7 GB HLO-temp footprint of the 300^3 f32 dense case),
        must fit a 9 GB budget (16 GB HBM minus params/opt/grads and
        forward temps)."""
        mode = getattr(self.args, "remat", "auto")
        if mode == "on":
            return True
        if mode == "off":
            return False
        if not bool(getattr(self.args, "fused_passes", 0)):
            # sequential (default): store-mode residuals stay small — the
            # strided sampler's custom VJP keeps rows+weights, not gathered
            # blocks (ops/coalesced.py), and each pass's forward temps are
            # freed before the next pass. Measured fastest at <=350^3
            # (446 vs 908 ms rematerialized, 300^3 bf16, PERF.md §3) AND at
            # 640^3-class grids once grad accumulation bounds the live
            # micro-batch (1,334 vs 1,568 ms, PERF.md §9). Rematerialize
            # only in the 350-500^3 band where accumulation is off and the
            # tables crowd HBM.
            n = int(self.args.N_voxel_final)
            return 350 ** 3 < n and self._grad_accum() < 4
        # batched evals: all chunks' residuals are stored until the backward,
        # so estimate them (take output + masked copy per chunk)
        per_dyn, per_st = self._gather_row_bytes()
        est = (7 * per_dyn + 9 * per_st) * 0.65
        return est > 9e9

    def _build_step(self):
        self.step_fn = make_train_step(self._statics())

    # ------------------------------------------------------------------
    def run_step(self) -> Dict[str, float]:
        i = self.iteration
        if self.sampler_override is not None:
            idx, idx_rand = self.sampler_override(i)
            ray_idx = jnp.asarray(idx)
            ray_idx_rand = jnp.asarray(idx_rand)
        else:
            ray_idx = jnp.asarray(self.sampler.nextids())
            ray_idx_rand = jnp.asarray(self.sampler2.nextids())
        if self.mesh is not None:
            from ..parallel import global_batch_from_local, shard_batch_indices

            if self.mesh.size == jax.device_count() and jax.process_count() > 1:
                ray_idx = global_batch_from_local(self.mesh, np.asarray(ray_idx))
                ray_idx_rand = global_batch_from_local(self.mesh, np.asarray(ray_idx_rand))
            else:
                ray_idx = shard_batch_indices(self.mesh, ray_idx)
                ray_idx_rand = shard_batch_indices(self.mesh, ray_idx_rand)
        self.key, sub = jax.random.split(self.key)
        sc = {
            "iteration": jnp.asarray(i, jnp.int32),
            "focal_fixed": jnp.asarray(self.focal_fixed, jnp.float32),
        }
        sc.update({k: jnp.asarray(v, jnp.float32) for k, v in self.schedule.scalars(i).items()})
        self.params, self.opt_state, metrics = self.step_fn(
            self.params, self.opt_state, self.aabb, self.data, ray_idx, ray_idx_rand, sub, sc
        )
        self.schedule.after_step(i)
        self.iteration += 1

        # upsample at the END of iteration i when i in upsamp_list — the
        # reference's in-body check (train.py:2582), so the upsampled grid is
        # first used by iteration i+1
        cfg_changed = self._refresh_app_frac()
        if i in self.args.upsamp_list:
            self._upsample(i)
        elif cfg_changed:
            self._build_step()
        return metrics

    def _app_start_eff(self) -> int:
        """First iteration with appearance compaction active (-1 = never).

        Default (--app_start -1): the step after the first voxel upsample —
        by then density has concentrated, so the per-ray top-K bucket covers
        the reference's above-threshold samples and the compacted step is
        exact (ops/compaction.py). Before that, weights are near-uniform and
        truncation would alter early optimization vs the reference."""
        a = self.args
        if getattr(a, "app_frac", 0.0) <= 0.0:
            return -1
        start = int(getattr(a, "app_start", -1))
        if start >= 0:
            return start
        ups = sorted(a.upsamp_list)
        return (int(ups[0]) + 1) if ups else 0

    def _refresh_app_frac(self) -> bool:
        """Sync cfg.app_frac with the activation schedule; True if changed
        (the caller must rebuild the jitted step)."""
        import dataclasses

        eff = self._app_start_eff()
        af = float(self.args.app_frac) if (eff >= 0 and self.iteration >= eff) else 0.0
        if af == self.static_cfg.app_frac:
            return False
        self.static_cfg = dataclasses.replace(self.static_cfg, app_frac=af)
        self.dynamic_cfg = dataclasses.replace(self.dynamic_cfg, app_frac=af)
        return True

    def update_alpha_mask(self):
        """Rebuild the dual-field occupancy mask at the current params
        (reference updateAlphaMask contract, tensorBase.py:591-629; dual-max
        semantics fields/alpha_mask.build_dual_alpha_mask). Called by the
        train.py loop at update_AlphaMask_list iterations. With
        --compact_train, also (re)sizes and enables the train step's [R, K]
        sample compaction against the fresh mask."""
        from ..fields.alpha_mask import build_dual_alpha_mask

        params = {"static": self.params["static"], "dynamic": self.params["dynamic"]}
        self.alpha_mask = build_dual_alpha_mask(
            params, self.static_cfg, self.dynamic_cfg, np.asarray(self.aabb),
            n_frames=self.scene.n_frames, thres=self.args.alpha_mask_thre,
        )
        occ = float(np.asarray(self.alpha_mask.alpha_volume).mean())
        print(f"alpha mask updated: grid {self.alpha_mask.alpha_volume.shape} "
              f"occupancy {occ:.3f}")
        if bool(getattr(self.args, "compact_train", 0)):
            self._enable_train_compaction()
        return occ

    def _probe_compact_k(self, stride: int = 3, margin: float = 1.1,
                         quantum: int = 16) -> tuple:
        """Size the train step's compaction buckets from the measured
        occupancy DISTRIBUTION over a strided probe of every frame's pixel
        grid at the CURRENT cameras. Returns (K, flat_per_ray).

        K ([R, K] bucket): per-ray occupancy is heavily skewed (measured at
        the converged no_poses mask: mean 37, p99.5 ~2-4x the mean, max 199
        of 270) — a max-based K forfeits most of the win to a sliver of
        long rays, so K = quantile(counts, --compact_quantile, default
        0.995) x margin (sampler jitter moves samples by up to one bin;
        poses drift until the next mask refresh), rounded up to `quantum`
        (compile-cache friendly). Rays above K drop their FARTHEST occupied
        samples (occluded-most-first; exactness for >=quantile of rays,
        quality gated by the --compact_train long run, QUALITY.md).

        flat_per_ray (flat bucket, StepStatics.compact_flat): the field
        evals' per-sample work scales with the batch TOTAL, which
        CLT-concentrates at batch 1024 — sized from the UNION-occupancy
        mean (shared A/B/E geometry masks with the union of two times,
        train_loss) plus 4 batch-sigma, x margin. Probed with an
        independent random time per ray, the same distribution the step's
        ts_rand draws from."""
        from ..fields.alpha_mask import occupancy_nearest
        from ..render.sampling import sample_xyz
        from ..core.se3 import pose_to_mtx
        from .step import _rays_from_idx, focal_from_fov

        mask, H, W = self.alpha_mask, self.H, self.W
        T = self.args.N_voxel_t
        S = self._statics()
        vol_d = self._dilated_volume()
        uu, vv = np.meshgrid(np.arange(0, W, stride), np.arange(0, H, stride))
        pix = np.ascontiguousarray((vv * W + uu).reshape(-1).astype(np.int64))

        @jax.jit
        def probe(params, ray_idx, ts, ts_rand):
            if S.optimize_focal:
                focal = focal_from_fov(params["fov"][0, 0], H, W)
            else:
                focal = jnp.asarray(self.focal_fixed, jnp.float32)
            rays, _, _, _ = _rays_from_idx(ray_idx, pose_to_mtx(params["pose"]), focal, S)
            xyz, _, valid = sample_xyz(
                rays, self.n_samples, S.ray_type, S.static_cfg.near_far,
                self.aabb, S.step_size, None,
            )
            R_, S_ = valid.shape
            flat3 = xyz.reshape(-1, 3)
            t_flat = jnp.broadcast_to(ts[:, None], (R_, S_)).reshape(-1)
            tr_flat = jnp.broadcast_to(ts_rand[:, None], (R_, S_)).reshape(-1)
            occ = occupancy_nearest(vol_d, mask.aabb, flat3, t_flat).reshape(R_, S_)
            occ_u = occ | occupancy_nearest(
                vol_d, mask.aabb, flat3, tr_flat
            ).reshape(R_, S_)
            return (
                jnp.sum((valid & occ).astype(jnp.int32), axis=1),
                jnp.sum((valid & occ_u).astype(jnp.int32), axis=1),
            )

        rng = np.random.default_rng(0)
        all_ts = np.asarray(self.data["ts"][:: H * W])  # one t per frame
        cs, cus = [], []
        for t in range(T):
            idx = jnp.asarray(t * H * W + pix)
            tr = jnp.asarray(rng.choice(all_ts, size=pix.shape[0]), jnp.float32)
            c, cu = probe(self.params, idx, self.data["ts"][idx], tr)
            cs.append(np.asarray(c))
            cus.append(np.asarray(cu))
        counts = np.concatenate(cs)
        counts_u = np.concatenate(cus)
        q = float(getattr(self.args, "compact_quantile", 0.995))
        c_q = float(np.quantile(counts, min(max(q, 0.0), 1.0)))
        K = int(-(-c_q * margin // quantum) * quantum)
        K = min(max(K, quantum), self.n_samples)
        B = max(int(self.args.batch_size), 1)
        f_budget = (counts_u.mean() + 4.0 * counts_u.std() / np.sqrt(B)) * margin
        F = int(-(-f_budget // 8) * 8)
        F = min(max(F, 8), self.n_samples)
        print(f"compaction probe: occupied mean {counts.mean():.1f} "
              f"(union {counts_u.mean():.1f}) p{100 * q:g} {c_q:.0f} "
              f"max {counts_u.max()} of {self.n_samples} samples/ray "
              f"-> K={K} flat={F}")
        return K, F

    def _dilated_volume(self):
        """The train step's occupancy volume: the mask pre-dilated one extra
        3^3 max-pool so the single-gather nearest-voxel test is a superset of
        the reference's trilinear>0 early-out (fields/alpha_mask
        .dilate_occupancy). Eval/render keep the reference-exact trilinear
        mask; only the train path trades test sharpness for 8x fewer
        serialized gather indices."""
        from ..fields.alpha_mask import dilate_occupancy

        return dilate_occupancy(self.alpha_mask.alpha_volume)

    def _enable_train_compaction(self):
        """Wire the fresh occupancy mask into the train step: mask volume
        rides in `data` (a jit ARGUMENT — a closed-over volume would embed as
        an HLO constant, see render/renderer.py), compact_k from the probe.
        Skips (stays dense) when the probe says the bucket would not shrink
        the sample axis by at least ~15%."""
        K, F = self._probe_compact_k()
        if K >= self.n_samples or K > 0.85 * self.n_samples:
            if self.compact_k:
                self.data = {k: v for k, v in self.data.items()
                             if not k.startswith("alpha_")}
                self.compact_k = 0
                self.compact_flat = 0
                self.alpha_shape = ()
                self._build_step()
            print(f"train compaction disabled (K={K} of {self.n_samples})")
            return
        vol_d = self._dilated_volume()
        # flat layout: a 4-D u8 jit parameter costs a full-volume relayout
        # copy + reshape EVERY step before the occupancy gather (~6.6 ms at
        # 192^3x12, profile_step_compact.json); dims ride StepStatics
        self.alpha_shape = tuple(int(s) for s in vol_d.shape)
        extra = {
            "alpha_volume": vol_d.reshape(-1),
            "alpha_aabb": self.alpha_mask.aabb,
        }
        if self.mesh is not None:
            from ..parallel.mesh import replicated

            extra = jax.device_put(extra, replicated(self.mesh))
        self.data = dict(self.data)
        self.data.update(extra)
        self.compact_k = K
        # flat-bucket evals only when they beat the [R, K] bucket's padded
        # work by a useful margin (they add an index build + scatter-back)
        self.compact_flat = (
            F if bool(getattr(self.args, "compact_flat", 1)) and F < 0.85 * K else 0
        )
        self._build_step()
        print(f"train compaction enabled: K={K} flat={self.compact_flat} "
              f"of {self.n_samples} samples/ray")

    def _upsample(self, iteration: int):
        """Coarse-to-fine grid growth (reference: train.py:2582-2606)."""
        n_voxels = self.n_voxel_list.pop(0)
        reso = n_to_reso(n_voxels, self.scene.scene_bbox)
        self.n_samples = min(self.args.nSamples, cal_n_samples(reso, self.args.step_ratio))
        self.params = dict(self.params)
        self.params["static"] = upsample_static_field(self.params["static"], reso)
        self.params["dynamic"] = upsample_dynamic_field(self.params["dynamic"], reso)
        self.static_cfg = self.static_cfg.with_grid(reso)
        self.dynamic_cfg = self.dynamic_cfg.with_grid(reso)
        self.schedule.on_upsample(iteration)
        # fresh Adam for the FIELD groups only (train.py:2606 recreates the
        # main optimizer); the pose/focal Adams and their moments survive
        # upsamples in the reference (only their lr is touched, 2592-2595)
        old = self.opt_state
        self.opt_state = dict(init_opt_state(self.params))
        self.opt_state["pose"] = old["pose"]
        self.opt_state["fov"] = old["fov"]
        if self.compact_k:
            # the bucket was sized against the OLD n_samples; re-probe the
            # (unchanged) mask at the new sampling density
            self._enable_train_compaction()
        self._build_step()

    # ------------------------------------------------------------------
    def train(self, n_steps: Optional[int] = None, log_every: int = 100, logger=None):
        n = n_steps if n_steps is not None else self.args.n_iters - self.iteration
        t0 = time.time()
        for _ in range(n):
            metrics = self.run_step()
            if logger is not None and (self.iteration % log_every == 0 or self.iteration == 1):
                host = {k: float(v) for k, v in metrics.items()}
                host["iter"] = self.iteration
                host["elapsed"] = time.time() - t0
                logger(host)
        return jax.tree_util.tree_map(float, metrics)
