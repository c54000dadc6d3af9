"""SPMD data-parallel trainer over a jax.sharding.Mesh.

TPU-native replacement for the reference's process-per-GPU NCCL setup
(`train.py:33-113`, `training_loop.py:349-542`):

- one process, one `Mesh` with a `data` axis; `shard_map` runs the per-device
  step; `psum` replaces the flat-grad `all_reduce` (`training_loop.py:536`)
- params/optimizer states are replicated (no rank-0 broadcast needed: init is
  computed once and placed replicated)
- the whole training iteration — all six phases (Gmain, Greg, Dmain, Dreg,
  D_semantic-main, D_semantic-reg), optimizer updates, w_avg update, EMA —
  is ONE jitted program per phase-combination (4 combos from the two reg
  intervals), so XLA fuses and overlaps everything including the collectives
- training statistics ride the same program as [count, sum, sumsq] moments,
  psum'd over the mesh (replaces `training_stats._sync`)

Lazy regularization follows `training_loop.py:359-373`: shared Adam per
module with lr and betas scaled by `r/(r+1)`; reg phases run every
`reg_interval` steps with loss gain = interval.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..train.ema import ema_update, copy_buffers
from ..train.loss import Pix2Pix3DLoss


def make_mesh(devices=None, axis="data"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


class FlatStats:
    """Mapping view over the step's single flat stats vector.

    The device program returns ONE [total] f32 array; the first key access
    triggers exactly one device->host transfer, then splits it into named
    moment vectors using the (name, size) spec recorded when the step
    function was traced."""

    def __init__(self, flat, spec):
        self._flat = flat
        self._spec = spec
        self._split = None

    def _asdict(self):
        if self._split is None:
            if isinstance(self._flat, (list, tuple)):  # per-phase jit mode
                a = np.concatenate([np.asarray(f) for f in self._flat])
            else:
                a = np.asarray(self._flat)
            out, off = {}, 0
            for k, n in self._spec:
                out[k] = a[off:off + n]
                off += n
            assert off == a.size, (off, a.size, list(self._spec))
            self._split = out
        return self._split

    def __getitem__(self, key):
        return self._asdict()[key]

    def __contains__(self, key):
        return key in self._asdict()

    def __iter__(self):
        return iter(self._asdict())

    def __len__(self):
        return len(self._asdict())

    def keys(self):
        return self._asdict().keys()

    def values(self):
        return self._asdict().values()

    def items(self):
        return self._asdict().items()


def _nan_to_num(tree):
    """ref `training_loop.py:538`: nan->0, +-inf->+-1e5 on the grads."""
    return jax.tree_util.tree_map(
        lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5), tree)


def _lazy_adam(lr, betas, eps, reg_interval):
    """Adam with lazy-regularization scaling (ref `training_loop.py:366-372`)."""
    if reg_interval is None:
        mb_ratio = 1.0
    else:
        mb_ratio = reg_interval / (reg_interval + 1)
    return optax.adam(learning_rate=lr * mb_ratio,
                      b1=betas[0] ** mb_ratio,
                      b2=betas[1] ** mb_ratio,
                      eps=eps)


class Trainer:
    def __init__(self, loss: Pix2Pix3DLoss, *, g_lr=0.0025, d_lr=0.002,
                 betas=(0.0, 0.99), eps=1e-8, g_reg_interval: Optional[int] = 4,
                 d_reg_interval: Optional[int] = 16, mesh: Optional[Mesh] = None,
                 axis="data", grad_accum_rounds=1, split_cross_view=True,
                 jit_phases=False):
        self.loss = loss
        self.G = loss.G
        self.D = loss.D
        self.D_semantic = loss.D_semantic
        self.g_reg_interval = g_reg_interval
        self.d_reg_interval = d_reg_interval
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis = axis
        # Gradient accumulation (ref `batch_gpu` micro-batch rounds,
        # `training_loop.py:521-525`): per-device batch is split into
        # `grad_accum_rounds` micro-batches whose mean-loss grads are SUMMED
        # before the optimizer step, matching the reference's scaling.
        self.grad_accum_rounds = int(grad_accum_rounds)
        self.opt_g = _lazy_adam(g_lr, betas, eps, g_reg_interval)
        self.opt_d = _lazy_adam(d_lr, betas, eps, d_reg_interval)
        self.opt_dsem = _lazy_adam(d_lr, betas, eps, d_reg_interval)
        # run the cross-view stop-grad renders as a SEPARATE program: the
        # monolithic g_main+cross-view program crashes the v5e TPU worker
        # (see loss.cross_view_prep); values are identical either way
        self.split_cross_view = split_cross_view
        # jit each phase as its own program instead of one monolith — see
        # make_step.  Default off (the monolith is the TPU training mode);
        # the CPU-mesh dryrun turns it on to fit the cold-compile budget.
        self.jit_phases = jit_phases
        self._step_cache = {}
        self._cv_prep_cache = {}

    # ------------------------------------------------------------------ init
    def init_state(self, rng):
        kg, kd, kds = jax.random.split(rng, 3)
        params_g = self.G.init(kg)
        params_d = self.D.init(kd)
        state = {
            "G": params_g,
            "D": params_d,
            "G_ema": jax.tree_util.tree_map(jnp.copy, params_g),
            "opt_G": self.opt_g.init(params_g),
            "opt_D": self.opt_d.init(params_d),
        }
        if self.D_semantic is not None:
            params_dsem = self.D_semantic.init(kds)
            state["D_semantic"] = params_dsem
            state["opt_D_semantic"] = self.opt_dsem.init(params_dsem)
        return state

    # ------------------------------------------------------------------ step
    def _phase_update(self, loss_fn, params, opt, opt_state, gain, axis):
        """grad (accumulated over micro-batch rounds) -> ONE flat psum-mean
        -> nan_to_num -> adam.  Returns new params/opt plus the phase's aux
        outputs.  `loss_fn(params, round_idx)` sees one micro-batch.

        The cross-replica reduction is a SINGLE pmean over the raveled
        gradient vector — the same design as the reference's flat-grad
        all_reduce (`training_loop.py:531-542`): one latency-bound
        collective per phase instead of one per parameter leaf.  On ICI
        this amortizes collective launch latency; on the CPU-mesh dryrun it
        removes hundreds of rendezvous points."""
        from jax.flatten_util import ravel_pytree
        rounds = self.grad_accum_rounds
        if rounds <= 1:
            (_, aux), grads = jax.value_and_grad(
                lambda p: loss_fn(p, 0), has_aux=True)(params)
        else:
            # static unroll (rounds is small); a lax.scan formulation hit an
            # XLA:CPU codegen crash on the grad-of-scan program
            grads = aux = None
            for r in range(rounds):
                (_, aux_r), g = jax.value_and_grad(
                    lambda p: loss_fn(p, r), has_aux=True)(params)
                grads = g if grads is None else \
                    jax.tree_util.tree_map(jnp.add, grads, g)
                # phases emit summable aux (stat moments; ws pre-divided)
                aux = aux_r if aux is None else \
                    jax.tree_util.tree_map(jnp.add, aux, aux_r)
        flat, unravel = ravel_pytree(grads)
        flat = jax.lax.pmean(flat * gain, axis)
        flat = jnp.nan_to_num(flat, nan=0.0, posinf=1e5, neginf=-1e5)
        grads = unravel(flat)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux

    def _device_step(self, state, batch, gen_z, gen_c, rng, ema_beta,
                     do_greg, do_dreg, do_dsemreg, blur_sigma, nrr,
                     aug_p=None, blur_size=None, raw_fade=None, cv_aux=None,
                     stats_spec_out=None, only=None):
        """One full training iteration on one device's shard.

        `blur_sigma` is traced (a scalar array) when `blur_size` is a
        positive static int — the pair is forwarded to the loss as a tuple
        so one compiled program serves every σ within a kernel-width bucket
        during the blur fade.

        `only`: run a single named phase instead of the whole iteration
        (per-phase jit mode, `jit_phases=True`) — the rng derivation is
        IDENTICAL either way (one split(6) up front, phase i uses rngs[i]),
        so a sequence of per-phase programs computes the same update as
        the monolith."""
        if blur_size is not None:
            blur_sigma = (blur_sigma, blur_size)
        axis = self.axis
        loss = self.loss
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        rngs = jax.random.split(rng, 6)
        stats = {}
        rounds = self.grad_accum_rounds
        assert batch["pose"].shape[0] % rounds == 0 and \
            batch["pose"].shape[0] >= rounds, (
            f"per-device batch {batch['pose'].shape[0]} not divisible into "
            f"{rounds} accumulation rounds")
        mb_size = batch["pose"].shape[0] // rounds

        def mb(tree, r):
            """Micro-batch slice for accumulation round r."""
            if rounds <= 1:
                return tree
            return jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_slice_in_dim(x, r * mb_size, mb_size,
                                                       axis=0), tree)

        def add_stats(d):
            for k, v in d.items():
                stats[k] = stats.get(k, 0) + v

        dsem = state.get("D_semantic")

        def on(name):
            return only is None or only == name

        # --- Gmain
        if on("gmain"):
            def gmain(p, r):
                cv_kw = {} if cv_aux is None else {"cv_aux": mb(cv_aux, r)}
                return loss.g_main(p, state["D"], dsem, mb(batch, r),
                                   mb(gen_z[0], r), mb(gen_c[0], r),
                                   jax.random.fold_in(rngs[0], r), blur_sigma,
                                   nrr, aug_p=aug_p, raw_fade=raw_fade, **cv_kw)
            state["G"], state["opt_G"], s = self._phase_update(
                gmain, state["G"], self.opt_g, state["opt_G"], 1.0, axis)
            add_stats(s)

        # --- Greg (density regularization)
        if do_greg and on("greg"):
            def greg(p, r):
                return loss.g_reg(p, mb(batch, r), mb(gen_z[1], r),
                                  jax.random.fold_in(rngs[1], r))
            state["G"], state["opt_G"], s = self._phase_update(
                greg, state["G"], self.opt_g, state["opt_G"],
                float(self.g_reg_interval), axis)
            add_stats(s)

        # --- Dmain (also carries the w_avg update, ref loss.py:846)
        if on("dmain"):
            def dmain(p, r):
                l, (s, aux) = loss.d_main(p, state["G"], mb(batch, r),
                                          mb(gen_z[2], r), mb(gen_c[2], r),
                                          jax.random.fold_in(rngs[2], r),
                                          blur_sigma, nrr, aug_p=aug_p,
                                          raw_fade=raw_fade)
                # reduce ws inside the round so accumulation can sum it
                return l, dict(s, **{"_ws_mean": jnp.mean(aux["ws"], axis=0)
                                     / rounds})
            state["D"], state["opt_D"], s = self._phase_update(
                dmain, state["D"], self.opt_d, state["opt_D"], 1.0, axis)
            ws_mean = s.pop("_ws_mean")
            add_stats(s)
            state["G"] = self._apply_w_avg(state["G"], ws_mean, axis)

        # --- Dreg (R1)
        if do_dreg and loss.r1_gamma > 0 and on("dreg"):
            def dreg(p, r):
                return loss.d_r1(p, mb(batch, r),
                                 jax.random.fold_in(rngs[3], r), blur_sigma, nrr,
                                 aug_p=aug_p, raw_fade=raw_fade)
            state["D"], state["opt_D"], s = self._phase_update(
                dreg, state["D"], self.opt_d, state["opt_D"],
                float(self.d_reg_interval), axis)
            add_stats(s)

        # --- D_semantic phases
        if dsem is not None:
            if on("dsmain"):
                def dsmain(p, r):
                    return loss.d_semantic_main(p, state["G"], mb(batch, r),
                                                mb(gen_z[3], r), mb(gen_c[3], r),
                                                jax.random.fold_in(rngs[4], r),
                                                blur_sigma, nrr, aug_p=aug_p,
                                                raw_fade=raw_fade)
                state["D_semantic"], state["opt_D_semantic"], s = \
                    self._phase_update(dsmain, state["D_semantic"],
                                       self.opt_dsem, state["opt_D_semantic"],
                                       1.0, axis)
                add_stats(s)

            if do_dsemreg and loss.r1_gamma > 0 and on("dsreg"):
                def dsreg(p, r):
                    return loss.d_semantic_r1(p, mb(batch, r),
                                              jax.random.fold_in(rngs[5], r),
                                              blur_sigma, nrr, aug_p=aug_p,
                                              raw_fade=raw_fade)
                state["D_semantic"], state["opt_D_semantic"], s = \
                    self._phase_update(dsreg, state["D_semantic"],
                                       self.opt_dsem, state["opt_D_semantic"],
                                       float(self.d_reg_interval), axis)
                add_stats(s)

        # --- EMA (ref training_loop.py:549-559)
        if on("ema"):
            state["G_ema"] = ema_update(state["G_ema"], state["G"], ema_beta)
            state["G_ema"] = copy_buffers(state["G_ema"], state["G"])

        # ONE collective for all stat moments (vs one psum per metric) AND
        # one flat device->host transfer per step: the host splits the
        # vector back into named moments using the spec recorded at trace
        # time (~16 stats x [3] would otherwise be ~50 small fetches over
        # the axon tunnel every step).
        from jax.flatten_util import ravel_pytree
        flat_stats, _ = ravel_pytree(stats)
        if stats_spec_out is not None:
            del stats_spec_out[:]  # retrace resets the spec
            stats_spec_out.extend(
                (k, int(np.prod(np.shape(v), dtype=np.int64)))
                for k, v in sorted(stats.items()))
        if flat_stats.size:  # the ema-only program has no stats to reduce
            flat_stats = jax.lax.psum(flat_stats, axis)
        return state, flat_stats

    def _apply_w_avg(self, params_g, ws_mean, axis):
        """Update the conditional mapping's w_avg from the D-phase batch-mean
        ws `[num_ws, w_dim]` (cross-replica mean; the reference updates
        per-replica and lets them diverge — we keep replicas identical)."""
        mapping = self.G.backbone.mapping
        mp = params_g["backbone"]["mapping"]
        if "w_avg" not in mp:
            return params_g
        ws_mean = jax.lax.pmean(ws_mean, axis)
        if mp["w_avg"].ndim == 1 and ws_mean.ndim == 2:
            ws_mean = ws_mean[0]
        beta = mapping.w_avg_beta
        new_avg = ws_mean + beta * (mp["w_avg"] - ws_mean)
        params_g = dict(params_g)
        params_g["backbone"] = dict(params_g["backbone"])
        params_g["backbone"]["mapping"] = dict(mp, w_avg=new_avg)
        return params_g

    def _build_program(self, do_greg, do_dreg, do_dsemreg, blur_size, nrr,
                       only=None):
        """One jitted shard_map'd program: the whole iteration (only=None)
        or a single named phase (per-phase jit mode)."""
        axis = self.axis
        rep = P()
        data = P(axis)           # shard batch dim
        phase_data = P(None, axis)  # [n_phases, B, ...]: shard dim 1

        stats_spec = []
        fn = functools.partial(self._device_step, do_greg=do_greg,
                               do_dreg=do_dreg, do_dsemreg=do_dsemreg,
                               nrr=nrr, stats_spec_out=stats_spec, only=only)

        # Only thread dynamic scalars (blur σ, raw_fade, ADA p) through the
        # traced signature when the corresponding feature is active — keeps
        # baseline programs byte-identical and their compile cache warm
        # across rounds.  `dyn_names` fixes the positional order of the
        # active extras.
        dyn_names = []
        if blur_size > 0:
            fn = functools.partial(fn, blur_size=blur_size)
            dyn_names.append("blur_sigma")
        else:
            fn = functools.partial(fn, blur_sigma=0.0)
        if self.loss.raw_fade_kimg:
            dyn_names.append("raw_fade")
        if self.loss.augment_pipe is not None:
            dyn_names.append("aug_p")
        else:
            fn = functools.partial(fn, aug_p=None)
        use_cv_prep = (getattr(self.loss, "lambda_cross_view", 0) > 0
                       and self.split_cross_view)
        in_specs = (rep, data, phase_data, phase_data, rep, rep) \
            + ((data,) if use_cv_prep else ()) \
            + (rep,) * len(dyn_names)

        if dyn_names or use_cv_prep:
            def ordered(state, batch, gen_z, gen_c, rng, ema_beta, *rest,
                        _fn=fn, _names=tuple(dyn_names), _cv=use_cv_prep):
                if _cv:
                    cv_aux, dyn = rest[0], rest[1:]
                else:
                    cv_aux, dyn = None, rest
                return _fn(state, batch, gen_z, gen_c, rng, ema_beta,
                           cv_aux=cv_aux, **dict(zip(_names, dyn)))
            fn = ordered

        sharded = jax.shard_map(
            fn, mesh=self.mesh,
            in_specs=in_specs,
            out_specs=(rep, rep),
            check_vma=False)
        # KNOWN ISSUE (environment): at per-device batch 4 the XLA:TPU
        # space-to-batch converter pass crashes the compiler (SIGABRT,
        # "expected compatible shape ... f32 vs pred" in
        # space_to_batch_converter.cc).  xla_tpu_run_space_to_batch=false
        # would disable the pass but is a libtpu absl flag that the remote
        # compile helper does not forward.  Per-device batch >= 8 does not
        # trigger the pass; use --remat to fit the larger batch.
        #
        # `state` is donated: params + optimizer states + EMA are updated
        # in place instead of double-buffered (saves the full state size in
        # HBM per step; callers all rebind `state` from the return).
        jitted = jax.jit(sharded, donate_argnums=(0,))
        return jitted, stats_spec

    def _phase_names(self, do_greg, do_dreg, do_dsemreg):
        names = ["gmain"]
        if do_greg:
            names.append("greg")
        names.append("dmain")
        if do_dreg and self.loss.r1_gamma > 0:
            names.append("dreg")
        if self.D_semantic is not None:
            names.append("dsmain")
            if do_dsemreg and self.loss.r1_gamma > 0:
                names.append("dsreg")
        names.append("ema")
        return names

    def make_step(self, do_greg, do_dreg, do_dsemreg, blur_size, nrr):
        """Build (and cache) the jitted step for one combination of static
        schedule values.

        Only the blur KERNEL WIDTH is static; σ itself is a traced scalar
        argument, so a full blur fade (σ changing every step, e.g. seg2cat
        Δσ≈0.0016/step) compiles O(blur_init·3) programs, not thousands.

        Monolith mode (default): ONE program runs every phase + EMA, so
        XLA fuses and overlaps across phases — the TPU training config.
        Per-phase mode (`jit_phases=True`): one program per phase, chained
        host-side on the full donated state — mathematically identical
        (same rng split, same update order; pass-through leaves alias
        through).  Programs are ~6x smaller, which keeps a COLD compile of
        the whole step within the driver's dryrun budget on the 1-core
        CPU-mesh host (the monolith compiles 15-19 min there; see
        __graft_entry__.dryrun_multichip)."""
        key = (do_greg, do_dreg, do_dsemreg, blur_size, nrr)
        if key in self._step_cache:
            return self._step_cache[key]

        if not self.jit_phases:
            self._step_cache[key] = self._build_program(
                do_greg, do_dreg, do_dsemreg, blur_size, nrr)
            return self._step_cache[key]

        programs = [self._build_program(do_greg, do_dreg, do_dsemreg,
                                        blur_size, nrr, only=name)
                    for name in self._phase_names(do_greg, do_dreg,
                                                  do_dsemreg)]

        class _ChainSpec:
            """Lazy view over the per-phase stat specs: each program's spec
            list is filled at ITS first trace, so chain at iteration time."""
            def __init__(self, parts):
                self._parts = parts

            def __iter__(self):
                return (kv for p in self._parts for kv in p)

        def run(state, *rest):
            flats = []
            for prog, _ in programs:
                state, flat = prog(state, *rest)
                flats.append(flat)
            return state, flats
        self._step_cache[key] = (run, _ChainSpec([s for _, s in programs]))
        return self._step_cache[key]

    def _cv_prep_device(self, state, batch, gen_z, gen_c, rng, nrr):
        """Per-device body of the split cross-view prep: EXACTLY the rng
        derivation and micro-batch slicing of the Gmain phase, so the
        precomputed stop-grad renders equal the monolithic ones."""
        axis = self.axis
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        rngs = jax.random.split(rng, 6)
        rounds = self.grad_accum_rounds
        mb_size = batch["pose"].shape[0] // rounds

        def mb(tree, r):
            if rounds <= 1:
                return tree
            return jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_slice_in_dim(
                    x, r * mb_size, mb_size, axis=0), tree)

        outs = [self.loss.cross_view_prep(
            state["G"], mb(gen_z[0], r), mb(batch, r), mb(gen_c[0], r),
            jax.random.fold_in(rngs[0], r), nrr) for r in range(rounds)]
        if rounds <= 1:
            return outs[0]
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs)

    def make_cv_prep(self, nrr):
        """Jitted shard_map'd cross-view prep program (no donation: the
        caller passes the same state to the step program right after)."""
        if nrr in self._cv_prep_cache:
            return self._cv_prep_cache[nrr]
        rep = P()
        data = P(self.axis)
        phase_data = P(None, self.axis)
        fn = functools.partial(self._cv_prep_device, nrr=nrr)
        sharded = jax.shard_map(fn, mesh=self.mesh,
                                in_specs=(rep, data, phase_data, phase_data,
                                          rep),
                                out_specs=data, check_vma=False)
        jitted = jax.jit(sharded)
        self._cv_prep_cache[nrr] = jitted
        return jitted

    def step(self, state, batch, gen_z, gen_c, rng, *, step_idx, cur_nimg,
             batch_size, ema_kimg=10, ema_rampup=0.05, aug_p=0.0):
        """Host API: run one full training iteration.

        batch: dict of arrays sharded on the leading (batch) dim.
        gen_z/gen_c: `[n_phases(4), B, ...]` fresh per-phase latents/poses.
        """
        from ..train.ema import ema_beta as _ema_beta
        sched = self.loss.schedule(cur_nimg)
        do_greg = (self.g_reg_interval is not None
                   and step_idx % self.g_reg_interval == 0)
        do_dreg = (self.d_reg_interval is not None
                   and step_idx % self.d_reg_interval == 0)
        beta = _ema_beta(batch_size, cur_nimg, ema_kimg, ema_rampup)
        blur_sigma = sched["blur_sigma"]
        blur_size = int(np.floor(blur_sigma * 3))
        if blur_size > 0:
            # quantize the static kernel width UP to a multiple of 8: a
            # full fade compiles <=4 step programs instead of ~30 (compiles
            # are minutes each on this toolchain; short fades would
            # otherwise recompile nearly every step).  σ itself stays
            # traced/exact; the extra taps carry the true Gaussian weights
            # beyond the reference's floor(3σ) truncation (|w| < 1e-2 of
            # peak), a documented sub-1e-2 deviation during the fade only.
            blur_size = -(-blur_size // 8) * 8
        step_fn, stats_spec = self.make_step(
            do_greg, do_dreg, do_dreg, blur_size,
            sched["neural_rendering_resolution"])
        args = (state, batch, gen_z, gen_c, rng,
                jnp.asarray(beta, jnp.float32))
        if getattr(self.loss, "lambda_cross_view", 0) > 0 \
                and self.split_cross_view:
            cv_aux = self.make_cv_prep(sched["neural_rendering_resolution"])(
                state, batch, gen_z, gen_c, rng)
            args = args + (cv_aux,)
        if blur_size > 0:
            args = args + (jnp.asarray(blur_sigma, jnp.float32),)
        if self.loss.raw_fade_kimg:
            args = args + (jnp.asarray(sched["raw_fade"], jnp.float32),)
        if self.loss.augment_pipe is not None:
            args = args + (jnp.asarray(aug_p, jnp.float32),)
        state, flat_stats = step_fn(*args)
        return state, FlatStats(flat_stats, stats_spec)
