"""Pix2Pix3D training losses as pure phase functions.

Ref `training/loss.py:372-1022` (`Pix2Pix3DLoss`).  The reference mutates
`.grad` via per-term `.backward()` calls; here every phase is a pure
function `(params, inputs, rng) -> (scalar_loss, stats)` differentiated with
`jax.grad` — including the R1 terms, whose input-gradient penalty is an
inner `jax.grad` (double differentiation replaces the reference's
`conv2d_gradfix` machinery).

Loss inventory (ref lines in parens):
- GAN softplus G/D on the dual discriminator (:566, :843, :866)
- semantic-GAN via D_semantic with rgb-detach (:568-593)
- reconstruction smooth-L1 + LPIPS on image & raw (:596-607), raw-only option
- semantic reconstruction: weighted CE (seg, :611-618) or smooth-L1 x
  edge_weight (edge, :620-625)
- silhouette MSE on the weight image (:633-638, :1005-1022)
- cross-view consistency (:658-678)
- density regularization l1 / monotonic-detach / monotonic-fixed (:681-825)
- dual-discrimination R1 on image + raw (:871-888), semantic R1 (:979-1003)
- random-pose training with prob `random_c_prob` (:525-530)
- discriminator blur fade (:516-517), nrr fade (:532-538)
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.upfirdn2d import setup_filter, filter2d
from ..ops.resize import resize_bilinear
from ..nn.discriminator import filtered_resizing
from .stats import StatsAccumulator


def smooth_l1(x, y):
    """torch F.smooth_l1_loss (beta=1), mean-reduced."""
    d = jnp.abs(x - y)
    return jnp.mean(jnp.where(d < 1, 0.5 * d * d, d - 0.5))


def cross_entropy2d(logits_nhwc, target_hw, weight=None):
    """Weighted pixel CE (ref `training/loss_utils.py:4-17`), mean over
    pixels with torch's weighted-mean semantics."""
    n, h, w, c = logits_nhwc.shape
    logp = jax.nn.log_softmax(logits_nhwc, axis=-1)
    t = target_hw.astype(jnp.int32)
    picked = jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    if weight is None:
        return -jnp.mean(picked)
    w_per_px = weight[t]
    return -jnp.sum(picked * w_per_px) / jnp.sum(w_per_px)


def nearest_resize(x, size):
    """NHWC nearest-neighbor resize (torch F.interpolate mode='nearest')."""
    n, h, w, c = x.shape
    if h == size:
        return x
    idx = (jnp.arange(size) * (h / size)).astype(jnp.int32)
    return x[:, idx][:, :, idx]


# CelebAMask 19-class weights (ref `loss.py:414-427`).
SEG_WEIGHT_1 = np.array([
    0.42768099, 0.45614868, 1.59952169, 4.38863045, 4.85695198, 4.86439145,
    3.53563349, 3.57896961, 3.37838867, 3.66981824, 4.17743386, 3.5624441,
    2.78190484, 0.40917425, 2.38560636, 4.65813434, 17.17367367, 1.13303585,
    1.25281865], dtype=np.float32)
SEG_WEIGHT_2 = np.array([
    1.82911031e-01, 2.08071618e-01, 2.55846962e+00, 1.92600773e+01,
    2.35899825e+01, 2.36623042e+01, 1.25007042e+01, 1.28090235e+01,
    1.14135100e+01, 1.34675659e+01, 1.74509537e+01, 1.26910080e+01,
    7.73899453e+00, 1.67423571e-01, 5.69111768e+00, 2.16982155e+01,
    2.94935067e+02, 1.28377023e+00, 1.56955458e+00], dtype=np.float32)


class Pix2Pix3DLoss:
    """Pure-function phase losses over (G, D, D_semantic) modules."""

    def __init__(self, G, D, D_semantic=None, lpips=None, augment_pipe=None,
                 r1_gamma=10.0, blur_init_sigma=0.0, blur_fade_kimg=0.0,
                 neural_rendering_resolution_initial=64,
                 neural_rendering_resolution_final=None,
                 neural_rendering_resolution_fade_kimg=0,
                 gpc_reg_fade_kimg=1000, gpc_reg_prob=None,
                 dual_discrimination=True, filter_mode="antialiased",
                 random_c_prob=0.0, lambda_l1=2.0, lambda_lpips=10.0,
                 lambda_D_semantic=1.0, seg_weight=0, edge_weight=2.0,
                 only_raw_recons=False, silhouette_loss=False,
                 lambda_cross_view=0.0, style_mixing_prob=0.0,
                 raw_fade_kimg=None, remat=False):
        self.G = G
        self.D = D
        self.D_semantic = D_semantic
        self.lpips = lpips
        self.augment_pipe = augment_pipe
        self.r1_gamma = r1_gamma
        self.blur_init_sigma = blur_init_sigma
        self.blur_fade_kimg = blur_fade_kimg
        self.nrr_initial = neural_rendering_resolution_initial
        self.nrr_final = neural_rendering_resolution_final
        self.nrr_fade_kimg = neural_rendering_resolution_fade_kimg
        self.gpc_reg_fade_kimg = gpc_reg_fade_kimg
        self.gpc_reg_prob = gpc_reg_prob
        self.dual_discrimination = dual_discrimination
        self.filter_mode = filter_mode
        self.random_c_prob = random_c_prob
        self.lambda_l1 = lambda_l1
        self.lambda_lpips = lambda_lpips
        self.lambda_D_semantic = lambda_D_semantic
        self.edge_weight = edge_weight
        self.only_raw_recons = only_raw_recons
        self.silhouette_loss = silhouette_loss
        self.lambda_cross_view = lambda_cross_view
        # DummyDualDiscriminator subsumption (ref `dual_discriminator.py
        # :180-248`): when set, the raw branch of D fades 1 -> 0 over
        # `raw_fade_kimg` thousand images (the reference hardcodes a decay
        # of 1/(500000/32) per forward, i.e. ~500 kimg at batch 32, via a
        # stateful counter; here it is an explicit schedule like blur).
        self.raw_fade_kimg = raw_fade_kimg
        # The reference DEFINES style_mixing_prob but its application is
        # commented out in run_G (ref `loss.py:449-453`) — a nonzero value
        # is silently inert there.  We match that behavior but refuse to be
        # silent about it.
        self.style_mixing_prob = style_mixing_prob
        if remat:
            # rematerialize the G forward in the backward pass: the
            # renderer/SR activations dominate train-step HBM (the
            # reference leans on low nrr + fp16 for the same reason); remat
            # trades one extra forward for fitting bigger batches.
            # Opt-in (--remat) so cached step programs stay byte-identical.
            self.run_G = jax.checkpoint(self.run_G, static_argnums=(4,))
            # NB: checkpointing the D applications as well was measured to
            # INCREASE peak HBM by ~1.6 G at batch 8 (the rematted forward
            # inside the R1 double grad duplicates conv temps instead of
            # freeing them) — G-forward remat only.
        if style_mixing_prob:
            import warnings
            warnings.warn(
                "style_mixing_prob is inert: the reference comments out "
                "style mixing in run_G (loss.py:449-453) and this rebuild "
                "matches that; the value is stored but never applied.",
                stacklevel=2)
        self.resample_filter = setup_filter([1, 3, 3, 1])

        if int(seg_weight) == 1:
            self.seg_weight = jnp.asarray(SEG_WEIGHT_1)
        elif int(seg_weight) == 2:
            self.seg_weight = jnp.asarray(SEG_WEIGHT_2)
        else:
            self.seg_weight = None

    # ---------------------------------------------------------------- sched
    def schedule(self, cur_nimg):
        """Host-side per-step schedule (static under jit where shape-bearing)."""
        blur_sigma = (max(1 - cur_nimg / (self.blur_fade_kimg * 1e3), 0)
                      * self.blur_init_sigma if self.blur_fade_kimg > 0 else 0)
        if self.nrr_final is not None:
            alpha = min(cur_nimg / (self.nrr_fade_kimg * 1e3), 1)
            nrr = int(np.rint(self.nrr_initial * (1 - alpha)
                              + self.nrr_final * alpha))
        else:
            nrr = self.nrr_initial
        raw_fade = (max(1 - cur_nimg / (self.raw_fade_kimg * 1e3), 0)
                    if self.raw_fade_kimg else None)
        return dict(blur_sigma=float(blur_sigma),
                    neural_rendering_resolution=nrr, raw_fade=raw_fade)

    # --------------------------------------------------------------- pieces
    def _blur(self, image, blur_sigma):
        """Gaussian blur for the discriminator fade (ref `loss.py:516-517`).

        `blur_sigma` is either a plain float (σ baked into the trace) or a
        `(traced_sigma, static_kernel_size)` pair.  Only the kernel width
        `floor(3σ)` is shape-bearing; passing σ as a traced scalar lets the
        trainer reuse ONE compiled step per width bucket across the whole
        fade instead of recompiling every step (the reference passes σ
        dynamically for the same reason)."""
        if isinstance(blur_sigma, tuple):
            sigma, blur_size = blur_sigma
        else:
            sigma = blur_sigma
            blur_size = int(np.floor(float(blur_sigma) * 3))
        if blur_size <= 0:
            return image
        sigma = jnp.asarray(sigma, jnp.float32)
        f = jnp.exp2(-jnp.square(
            jnp.arange(-blur_size, blur_size + 1, dtype=jnp.float32) / sigma))
        return filter2d(image, f / jnp.sum(f))

    def run_G(self, params_g, z, batch, c_render, nrr, rng):
        ws = self.G.mapping(params_g, z, batch["pose"], batch)
        out = self.G.synthesis(params_g, ws, c_render,
                               neural_rendering_resolution=nrr, rng=rng,
                               noise_mode="random")
        return out, ws

    def _augment_pair(self, image, image_raw, rng, aug_p):
        """ADA on [image | upsampled raw] together, raw resized back
        (ref `loss.py:99-107`)."""
        c = image.shape[-1]
        raw_res = image_raw.shape[1]
        up_raw = resize_bilinear(image_raw, image.shape[1], antialias=True)
        pair = jnp.concatenate([image, up_raw], axis=-1)
        pair = self.augment_pipe(rng, pair, aug_p)
        return pair[..., :c], resize_bilinear(pair[..., c:], raw_res,
                                              antialias=True)

    def _apply_D(self, params_d, img, c, rng, raw_fade):
        return self.D(params_d, img, c, rng=rng, raw_fade=raw_fade)

    def _apply_D_semantic(self, params_dsem, img, c, rng, raw_fade):
        return self.D_semantic(params_dsem, img, c, rng=rng,
                               raw_fade=raw_fade)

    def run_D(self, params_d, img, c, blur_sigma, rng=None, aug=None,
              raw_fade=None):
        image = self._blur(img["image"], blur_sigma)
        image_raw = img["image_raw"]
        if self.augment_pipe is not None and aug is not None:
            image, image_raw = self._augment_pair(image, image_raw, *aug)
        return self._apply_D(params_d, {"image": image, "image_raw": image_raw},
                             c, rng, raw_fade)

    def run_D_semantic(self, params_dsem, img, c, blur_sigma, rng=None,
                       aug=None, raw_fade=None):
        image = self._blur(img["image"], blur_sigma)
        image_raw = img["image_raw"]
        if self.augment_pipe is not None and aug is not None:
            image, image_raw = self._augment_pair(image, image_raw, *aug)
        return self._apply_D_semantic(
            params_dsem, {"image": image, "image_raw": image_raw},
            c, rng, raw_fade)

    def _semantic_concat(self, gen_img, detach_rgb):
        """[image | semantic] concat for D_semantic (ref :568-593).
        seg: softmax the logits; edge: raw channels."""
        sem = gen_img["semantic"]
        sem_raw = gen_img["semantic_raw"]
        if self.G.data_type == "seg":
            sem = jax.nn.softmax(sem, axis=-1)
            sem_raw = jax.nn.softmax(sem_raw, axis=-1)
        image = gen_img["image"]
        image_raw = gen_img["image_raw"]
        if detach_rgb:
            image = jax.lax.stop_gradient(image)
            image_raw = jax.lax.stop_gradient(image_raw)
        return {"image": jnp.concatenate([image, sem], axis=-1),
                "image_raw": jnp.concatenate([image_raw, sem_raw], axis=-1)}

    def _real_pair(self, batch, nrr, blur_sigma):
        real_img = batch["image"]
        real_raw = filtered_resizing(real_img, size=nrr, f=self.resample_filter,
                                     filter_mode=self.filter_mode)
        real_raw = self._blur(real_raw, blur_sigma)  # blur_raw_target (ref :544-549)
        return {"image": real_img, "image_raw": real_raw}

    def _mode_coin(self, rng):
        """Bernoulli(random_c_prob): 1 -> render under random pose gen_c
        ('random_z_random_c'), 0 -> image pose ('random_z_image_c')."""
        if self.random_c_prob <= 0:
            return jnp.asarray(0.0)
        return (jax.random.uniform(rng) < self.random_c_prob).astype(jnp.float32)

    # --------------------------------------------------------------- phases
    def cross_view_prep(self, params_g, gen_z, batch, gen_c, rng, nrr):
        """The two stop-gradient renders of the cross-view term, as a
        SEPARATE program (same values as the monolithic path: identical rng
        derivation as `g_main`'s r_cv1/r_cv3).

        Motivation (measured, v5e): the full g_main+cross-view program
        crashes the TPU worker while every sub-program runs fine — see
        README "Known environment issue".  Splitting the no-grad renders
        out shrinks the differentiated program to a passing size and is
        mathematically identical (they carry no gradient either way)."""
        _, _, _, r_cv1, _, r_cv3 = jax.random.split(rng, 6)
        sg = lambda t: jax.tree_util.tree_map(jax.lax.stop_gradient, t)
        gi_rc, _ = self.run_G(params_g, gen_z, batch, gen_c, nrr, r_cv1)
        gi_rc = sg(gi_rc)
        if self.G.data_type == "seg":
            proj_mask = jnp.argmax(gi_rc["semantic"], axis=-1,
                                   keepdims=True).astype(jnp.float32)
        else:
            proj_mask = gi_rc["semantic"]
        gi_rec, _ = self.run_G(params_g, gen_z, batch, batch["pose"], nrr,
                               r_cv3)
        return {"proj_mask": proj_mask,
                "recon_sem_raw": sg(gi_rec["semantic_raw"])}

    def g_main(self, params_g, params_d, params_dsem, batch, gen_z, gen_c,
               rng, blur_sigma, nrr, aug_p=None, raw_fade=None, cv_aux=None):
        stats = StatsAccumulator()
        r_coin, r_g, r_d, r_cv1, r_cv2, r_cv3 = jax.random.split(rng, 6)
        aug = (None if (self.augment_pipe is None or aug_p is None)
               else (jax.random.fold_in(rng, 77), aug_p))
        coin = self._mode_coin(r_coin)
        c_render = jnp.where(coin > 0, gen_c, batch["pose"])
        recon_on = 1.0 - coin  # recon losses only in image-pose mode (ref :595)

        gen_img, _ws = self.run_G(params_g, gen_z, batch, c_render, nrr, r_g)
        gen_logits = self.run_D(params_d, gen_img, c_render, blur_sigma,
                                rng=r_d, aug=aug, raw_fade=raw_fade)
        stats.report("Loss/scores/fake", gen_logits)
        stats.report("Loss/signs/fake", jnp.sign(gen_logits))
        loss = jnp.mean(jax.nn.softplus(-gen_logits))

        if self.D_semantic is not None:
            input_img = self._semantic_concat(gen_img, detach_rgb=True)
            logits_sem = self.run_D_semantic(params_dsem, input_img, c_render,
                                             blur_sigma, aug=aug, raw_fade=raw_fade)
            stats.report("Loss/scores/fake_semantic", logits_sem)
            loss = loss + jnp.mean(jax.nn.softplus(-logits_sem)) * self.lambda_D_semantic

        # Reconstruction terms (masked out under random-pose mode).
        real = self._real_pair(batch, nrr, blur_sigma=0)
        lp = (lambda a, b: jnp.mean(self.lpips(a, b))) if self.lpips else (lambda a, b: 0.0)
        rec_full = smooth_l1(gen_img["image"], real["image"]) * self.lambda_l1 \
            + lp(gen_img["image"], real["image"]) * self.lambda_lpips
        rec_raw = smooth_l1(gen_img["image_raw"], real["image_raw"]) * self.lambda_l1 \
            + lp(gen_img["image_raw"], real["image_raw"]) * self.lambda_lpips
        rec = rec_full * (1 - float(self.only_raw_recons)) + rec_raw
        stats.report("Loss/G/loss_img_reconstruction", rec)
        loss = loss + rec * recon_on

        if "semantic" in gen_img:
            mask = batch["mask"]  # [N, H, W, 1]
            if self.G.data_type == "seg":
                mask_raw = nearest_resize(mask, nrr)
                sem_rec = cross_entropy2d(gen_img["semantic"], mask[..., 0],
                                          self.seg_weight) \
                    * (1 - float(self.only_raw_recons)) \
                    + cross_entropy2d(gen_img["semantic_raw"], mask_raw[..., 0],
                                      self.seg_weight)
            else:
                mask_raw = nearest_resize(mask, nrr)
                sem_rec = smooth_l1(gen_img["semantic"], mask) * self.edge_weight \
                    * (1 - float(self.only_raw_recons)) \
                    + smooth_l1(gen_img["semantic_raw"], mask_raw) * self.edge_weight
            stats.report("Loss/G/loss_semantic_reconstruction", sem_rec)
            loss = loss + sem_rec * recon_on

            if self.silhouette_loss and self.G.data_type == "seg" and "weight" in gen_img:
                mask_raw = nearest_resize(mask, nrr)
                sil = self.calculate_silhouette_loss(gen_img["weight"], mask_raw)
                stats.report("Loss/G/loss_silhouette", sil)
                loss = loss + sil * recon_on

        # Cross-view consistency (ref :658-678): render under a random pose,
        # feed the predicted semantics back as the input mask, compare the
        # re-rendered raw semantics against the direct reconstruction.
        if self.lambda_cross_view > 0:
            if cv_aux is not None:
                # stop-grad renders precomputed by `cross_view_prep` in a
                # separate program (identical values)
                proj_mask = cv_aux["proj_mask"]
                recon_sem_raw = cv_aux["recon_sem_raw"]
            else:
                gen_img_rc, _ = self.run_G(params_g, gen_z, batch, gen_c,
                                           nrr, r_cv1)
                gen_img_rc = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                                    gen_img_rc)
                if self.G.data_type == "seg":
                    proj_mask = jnp.argmax(gen_img_rc["semantic"], axis=-1,
                                           keepdims=True).astype(jnp.float32)
                else:
                    proj_mask = gen_img_rc["semantic"]
                gen_img_recon, _ = self.run_G(params_g, gen_z, batch,
                                              batch["pose"], nrr, r_cv3)
                recon_sem_raw = jax.lax.stop_gradient(
                    gen_img_recon["semantic_raw"])
            batch_proj = dict(batch)
            batch_proj["mask"] = proj_mask
            gen_img_proj, _ = self.run_G(params_g, gen_z, batch_proj,
                                         batch["pose"], nrr, r_cv2)
            cv = smooth_l1(gen_img_proj["semantic_raw"],
                           recon_sem_raw) * self.lambda_cross_view
            stats.report("Loss/G/loss_cross_view", cv)
            loss = loss + cv

        stats.report("Loss/G/loss", loss)
        return loss, stats.asdict()

    def g_reg(self, params_g, batch, gen_z, rng):
        """Density regularization (ref :681-825).  reg_type from
        rendering_kwargs: 'l1' (TV between nearby random points),
        'monotonic-detach'/'monotonic-fixed' (+ front-behind monotonicity)."""
        rk = self.G.rendering_kwargs
        density_reg = rk.get("density_reg", 0)
        if density_reg == 0:
            return jnp.asarray(0.0), {}
        reg_type = rk.get("reg_type", "l1")
        r_ws, r_pts, r_pert, r_dirs = jax.random.split(rng, 4)
        ws = self.G.mapping(params_g, gen_z, batch["pose"], batch)

        def sigma_pair(n_pts, perturb):
            initial = jax.random.uniform(r_pts, (ws.shape[0], n_pts, 3)) * 2 - 1
            perturbed = initial + perturb
            coords = jnp.concatenate([initial, perturbed], axis=1)
            dirs = jax.random.normal(r_dirs, coords.shape)
            sigma = self.G.sample_mixed(params_g, coords, dirs, ws,
                                        noise_mode="random", rng=r_ws)["sigma"]
            return sigma[:, :n_pts], sigma[:, n_pts:]

        if reg_type == "l1":
            pert = jax.random.normal(r_pert, (ws.shape[0], 1000, 3)) \
                * rk["density_reg_p_dist"]
            s_i, s_p = sigma_pair(1000, pert)
            loss = jnp.mean(jnp.abs(s_i - s_p)) * density_reg
        elif reg_type in ("monotonic-detach", "monotonic-fixed"):
            behind = jnp.asarray([0.0, 0.0, -1.0]) * (1 / 256) * rk["box_warp"]
            s_i, s_p = sigma_pair(2000, behind)
            if reg_type == "monotonic-detach":
                mono = jnp.mean(jax.nn.relu(jax.lax.stop_gradient(s_i) - s_p)) * 10
            else:
                mono = jnp.mean(jax.nn.relu(s_i - s_p)) * 10
            pert = jax.random.normal(r_pert, (ws.shape[0], 1000, 3)) \
                * (1 / 256) * rk["box_warp"]
            s_i2, s_p2 = sigma_pair(1000, pert)
            loss = mono + jnp.mean(jnp.abs(s_i2 - s_p2)) * density_reg
        else:
            # 'l1-alt' / 'total-variation' are CLI choices with no
            # implementation in the reference either — no-op.
            loss = jnp.asarray(0.0)
        return loss, {}

    def d_main(self, params_d, params_g, batch, gen_z, gen_c, rng, blur_sigma,
               nrr, aug_p=None, raw_fade=None):
        stats = StatsAccumulator()
        r_coin, r_g, r_d1, r_d2 = jax.random.split(rng, 4)
        aug = (None if (self.augment_pipe is None or aug_p is None)
               else (jax.random.fold_in(rng, 77), aug_p))
        coin = self._mode_coin(r_coin)
        c_render = jnp.where(coin > 0, gen_c, batch["pose"])

        gen_img, ws = self.run_G(params_g, gen_z, batch, c_render, nrr, r_g)
        gen_img = jax.tree_util.tree_map(jax.lax.stop_gradient, gen_img)
        gen_logits = self.run_D(params_d, gen_img, c_render, blur_sigma,
                                rng=r_d1, aug=aug, raw_fade=raw_fade)
        stats.report("Loss/scores/fake", gen_logits)
        stats.report("Loss/signs/fake", jnp.sign(gen_logits))
        loss_dgen = jnp.mean(jax.nn.softplus(gen_logits))

        real = self._real_pair(batch, nrr, blur_sigma)
        real_logits = self.run_D(params_d, real, batch["pose"], blur_sigma,
                                 rng=r_d2, aug=aug, raw_fade=raw_fade)
        stats.report("Loss/scores/real", real_logits)
        stats.report("Loss/signs/real", jnp.sign(real_logits))
        loss_dreal = jnp.mean(jax.nn.softplus(-real_logits))
        stats.report("Loss/D/loss", loss_dgen + loss_dreal)
        # w_avg EMA side-channel: ref updates it in the D phase's G run
        # (`run_G(update_emas=True)`, loss.py:846).
        aux = {"ws": jax.lax.stop_gradient(ws)}
        return loss_dgen + loss_dreal, (stats.asdict(), aux)

    def d_r1(self, params_d, batch, rng, blur_sigma, nrr, aug_p=None, raw_fade=None):
        """R1 on both real image and raw (ref :871-888); inner jax.grad wrt
        the images, outer differentiation wrt params_d flows through it."""
        stats = StatsAccumulator()
        real = self._real_pair(batch, nrr, blur_sigma)
        aug = (None if (self.augment_pipe is None or aug_p is None)
               else (jax.random.fold_in(rng, 77), aug_p))

        def logits_sum(image, image_raw):
            out = self.run_D(params_d, {"image": image, "image_raw": image_raw},
                             batch["pose"], blur_sigma, rng=rng, aug=aug, raw_fade=raw_fade)
            return jnp.sum(out)

        g_img, g_raw = jax.grad(logits_sum, argnums=(0, 1))(
            real["image"], real["image_raw"])
        penalty = jnp.sum(jnp.square(g_img), axis=(1, 2, 3))
        if self.dual_discrimination:
            penalty = penalty + jnp.sum(jnp.square(g_raw), axis=(1, 2, 3))
        loss = jnp.mean(penalty) * (self.r1_gamma / 2)
        stats.report("Loss/r1_penalty", penalty)
        stats.report("Loss/D/reg", loss)
        return loss, stats.asdict()

    def d_semantic_main(self, params_dsem, params_g, batch, gen_z, gen_c, rng,
                        blur_sigma, nrr, aug_p=None, raw_fade=None):
        stats = StatsAccumulator()
        r_coin, r_g, r_d = jax.random.split(rng, 3)
        aug = (None if (self.augment_pipe is None or aug_p is None)
               else (jax.random.fold_in(rng, 77), aug_p))
        coin = self._mode_coin(r_coin)
        c_render = jnp.where(coin > 0, gen_c, batch["pose"])

        gen_img, _ = self.run_G(params_g, gen_z, batch, c_render, nrr, r_g)
        gen_img = jax.tree_util.tree_map(jax.lax.stop_gradient, gen_img)
        input_img = self._semantic_concat(gen_img, detach_rgb=False)
        logits = self.run_D_semantic(params_dsem, input_img, c_render,
                                     blur_sigma, aug=aug, raw_fade=raw_fade)
        stats.report("Loss/scores/fake_semantic", logits)
        loss_gen = jnp.mean(jax.nn.softplus(logits))

        real_cat = self._real_semantic_pair(batch, nrr, blur_sigma)
        real_logits = self.run_D_semantic(params_dsem, real_cat, batch["pose"],
                                          blur_sigma, aug=aug, raw_fade=raw_fade)
        stats.report("Loss/scores/real_semantic", real_logits)
        loss_real = jnp.mean(jax.nn.softplus(-real_logits))
        stats.report("Loss/D/loss_semantic", loss_gen + loss_real)
        return loss_gen + loss_real, stats.asdict()

    def _real_semantic_pair(self, batch, nrr, blur_sigma):
        """Real [image | mask] pair for D_semantic (ref :942-963)."""
        real = self._real_pair(batch, nrr, blur_sigma)
        mask = batch["mask"]
        if self.G.data_type == "seg":
            mask = jax.nn.one_hot(mask[..., 0].astype(jnp.int32),
                                  self.G.semantic_channels, dtype=jnp.float32)
        mask_raw = filtered_resizing(mask, size=nrr, f=self.resample_filter,
                                     filter_mode=self.filter_mode)
        return {"image": jnp.concatenate([real["image"], mask], axis=-1),
                "image_raw": jnp.concatenate([real["image_raw"], mask_raw], axis=-1)}

    def d_semantic_r1(self, params_dsem, batch, rng, blur_sigma, nrr, aug_p=None, raw_fade=None):
        stats = StatsAccumulator()
        real_cat = self._real_semantic_pair(batch, nrr, blur_sigma)
        aug = (None if (self.augment_pipe is None or aug_p is None)
               else (jax.random.fold_in(rng, 77), aug_p))

        def logits_sum(image, image_raw):
            out = self.run_D_semantic(
                params_dsem, {"image": image, "image_raw": image_raw},
                batch["pose"], blur_sigma, aug=aug, raw_fade=raw_fade)
            return jnp.sum(out)

        g_img, g_raw = jax.grad(logits_sum, argnums=(0, 1))(
            real_cat["image"], real_cat["image_raw"])
        penalty = jnp.sum(jnp.square(g_img), axis=(1, 2, 3))
        if self.dual_discrimination:
            penalty = penalty + jnp.sum(jnp.square(g_raw), axis=(1, 2, 3))
        loss = jnp.mean(penalty) * self.r1_gamma * 0.5
        stats.report("Loss/r1_penalty_semantic", penalty)
        stats.report("Loss/D/reg_semantic", loss)
        return loss, stats.asdict()

    @staticmethod
    def calculate_silhouette_loss(weight_image, mask):
        """MSE between accumulated weights and fg mask x10 (ref :1005-1022)."""
        ref_sil = (mask > 0).astype(jnp.float32)
        return jnp.mean(jnp.square(weight_image - ref_sil)) * 10
