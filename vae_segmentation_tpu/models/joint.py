"""Composite models (reference `Joint`/`Joint2`/`Embed`, joint_model.py:438-501).

Each composite is a linen module whose submodule attribute names ('Seg', 'Vae',
'Dis', 'Encoder', 'Fusion') become top-level keys of the parameter pytree —
this is what makes the reference's selective checkpoint loading semantics
(--load_prefix -> Seg only, --load_prefix_vae -> Vae only,
--load_prefix_joint -> everything; main_target.py:355-394) a plain subtree
assignment here.

The reference threads a mutable data_dict through forward
(joint_model.py:447-452); that dict convention lives in the trainers. The
modules here are pure: arrays in, tuple of arrays out.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
from flax import linen as nn
import jax.numpy as jnp

from vae_segmentation_tpu.models.blocks import DEFAULT_FMAPS
from vae_segmentation_tpu.models.encoder import ShapeEncoder
from vae_segmentation_tpu.models.fusion import FusionNet
from vae_segmentation_tpu.models.unet import SegUNet
from vae_segmentation_tpu.models.vae import ShapeVAE


class Joint(nn.Module):
    """Seg -> VAE(pred) pipeline (joint_model.py:438-452).

    Gradients flow THROUGH the (typically frozen) VAE into the Seg — freezing
    is an optimizer-mask concern (train/optim.py), not a stop_gradient here
    (cf. main_target.py:396-399 + joint_model.py:450).
    """

    n_class: int = 2
    norm_type: int = 1
    dim: int = 128
    fmaps: Sequence[int] = DEFAULT_FMAPS
    vae_forward_scale: float = 0.0
    vae_decoder_dropout: float = 0.0
    seg_dropout: float = 0.0
    dtype: Any = jnp.bfloat16
    bottleneck: int = 16384
    # checkpoint the ENTIRE Seg and Vae forwards: backward then holds only
    # the pred volume between the two networks. With bf16 probabilities +
    # s2d the 128^3 batch-4 step fits WITHOUT this (852 ms vs 1207 ms with,
    # 2026-08-16), so it defaults off; turn on for memory-heavier configs
    # (vae_mont_number > 1 — the trainers do this automatically).
    composite_remat: bool = False
    # return pred/recon in the space-to-depth rep (when s2d is active):
    # the train steps keep the whole loss pipeline folded, skipping every
    # full-resolution reorg. Eval-facing Joints leave this False.
    folded_io: bool = False
    # stage-level remat of the sub-trunks (see blocks.remat_stage)
    trunk_remat: bool = True

    def _fold_active(self) -> bool:
        from vae_segmentation_tpu.models.blocks import use_s2d

        return use_s2d() and self.norm_type == 1

    def _wpack(self) -> bool:
        from vae_segmentation_tpu.models.blocks import stage_wpack

        return self._fold_active() and stage_wpack(self.fmaps)

    def setup(self):
        # static_argnums index (self, x, ...): the flag/rate args must be
        # static inside the checkpointed call — Joint calls them positionally
        Seg = nn.remat(SegUNet, static_argnums=(2,)) \
            if self.composite_remat else SegUNet
        Vae = nn.remat(ShapeVAE, static_argnums=(2, 3, 4, 5)) \
            if self.composite_remat else ShapeVAE
        fold = self._fold_active()
        self.Seg = Seg(n_class=self.n_class, norm_type=self.norm_type,
                       fmaps=self.fmaps, dtype=self.dtype,
                       folded_out=fold, remat=self.trunk_remat)
        self.Vae = Vae(n_class=self.n_class, norm_type=self.norm_type,
                       fmaps=self.fmaps, dim=self.dim, dtype=self.dtype,
                       bottleneck=self.bottleneck, folded_io=fold,
                       remat=self.trunk_remat)

    def __call__(self, image: jax.Array, dropout: bool = False):
        """image [B,D,H,W,1] -> (pred, recon, mean, std).

        dropout=True enables seg_dropout / vae_decoder_dropout (the MC branch,
        joint_model.py:447-451); mean/std are returned either way — the
        reference discards them in the dropout branch, which the trainers
        reproduce by simply not using them. With folded_io, pred/recon come
        back as s2d reps [B, D/2, H/2, W/2, 8*n_class].
        """
        from vae_segmentation_tpu.ops import s2d

        pred = self.Seg(image, self.seg_dropout if dropout else 0.0)
        recon, mean, std = self.Vae(
            pred, False, self.vae_forward_scale, False,
            self.vae_decoder_dropout if dropout else 0.0)
        if self._fold_active() and not self.folded_io:
            pred = s2d.unfold_rep(pred, self.n_class)
            recon = s2d.unfold_rep(recon, self.n_class)
        return pred, recon, mean, std

    def segment(self, image: jax.Array, dropout: bool = False) -> jax.Array:
        from vae_segmentation_tpu.ops import s2d

        pred = self.Seg(image, self.seg_dropout if dropout else 0.0)
        if self._fold_active() and not self.folded_io:
            pred = s2d.unfold_rep(pred, self.n_class)
        return pred

    def encode_pred(self, pred: jax.Array):
        """VAE encode of a prediction in THIS Joint's output rep (folded
        when folded_io) — the teacher KL path (train/steps.py)."""
        from vae_segmentation_tpu.ops import s2d

        if self._fold_active() and not self.folded_io:
            pred = s2d.fold_rep(pred, self._wpack())
        return self.Vae.encode(pred)

    def vae_forward(self, x: jax.Array, if_random: bool = False,
                    scale: float = 0.0, mid_input: bool = False,
                    dropout: float = 0.0):
        """Raw-in/raw-out VAE access (eval and analysis paths)."""
        from vae_segmentation_tpu.ops import s2d

        fold = self._fold_active()
        if fold and not mid_input:
            x = s2d.fold_rep(x, self._wpack())
        out = self.Vae(x, if_random, scale, mid_input, dropout)
        if not fold:
            return out
        if mid_input:
            return s2d.unfold_rep(out, self.n_class)
        recon, mean, std = out
        return s2d.unfold_rep(recon, self.n_class), mean, std


class Joint2(nn.Module):
    """Seg -> Discriminator(score of the class-1 channel)
    (joint_model.py:455-466)."""

    n_class: int = 2
    norm_type: int = 1
    fmaps: Sequence[int] = DEFAULT_FMAPS
    seg_dropout: float = 0.0
    dtype: Any = jnp.bfloat16
    bottleneck: int = 16384

    def setup(self):
        self.Seg = SegUNet(n_class=self.n_class, norm_type=self.norm_type,
                           fmaps=self.fmaps, dtype=self.dtype)
        self.Dis = ShapeEncoder(dim=1, norm_type=self.norm_type,
                                fmaps=self.fmaps, dtype=self.dtype,
                                bottleneck=self.bottleneck)

    def __call__(self, image: jax.Array, dropout: bool = False):
        pred = self.Seg(image, dropout=self.seg_dropout if dropout else 0.0)
        score = self.Dis(pred[..., 1:2])
        return pred, score


class Embed(nn.Module):
    """Encoder + VAE + Fusion latent-space segmentation
    (joint_model.py:469-501, built by main_source.py:259-264)."""

    n_class: int = 2
    norm_type: int = 1
    dim: int = 128
    fmaps: Sequence[int] = DEFAULT_FMAPS
    dtype: Any = jnp.bfloat16
    bottleneck: int = 16384

    def setup(self):
        self.Encoder = ShapeEncoder(dim=self.dim, norm_type=self.norm_type,
                                    fmaps=self.fmaps, dtype=self.dtype,
                                    bottleneck=self.bottleneck)
        self.Vae = ShapeVAE(n_class=self.n_class, norm_type=self.norm_type,
                            fmaps=self.fmaps, dim=self.dim, dtype=self.dtype,
                            bottleneck=self.bottleneck)
        self.Fusion = FusionNet(n_class=self.n_class, norm_type=self.norm_type,
                                fmaps=self.fmaps, dtype=self.dtype)

    def __call__(self, image: jax.Array, gt_onehot: jax.Array,
                 test_mode: bool = False,
                 latent_input: Optional[jax.Array] = None,
                 seg_input: Optional[jax.Array] = None):
        """Returns a dict mirroring the keys the reference writes into its
        data_dict (joint_model.py:475-501)."""
        out = {}
        latent = latent_input if latent_input is not None else self.Encoder(image)
        out["latent_code"] = latent
        gt_recon, latent_gt, latent_std = self.Vae(
            gt_onehot, if_random=True, scale=0.5)
        out["gt_recon"] = gt_recon
        out["latent_code_gt"] = latent_gt
        out["latent_code_std"] = latent_std
        if seg_input is not None:
            init_seg = seg_input
        else:
            init_seg = self.Vae(latent, mid_input=True)
        out["init_seg"] = init_seg
        fusion_mask = init_seg if test_mode else gt_recon
        out["pred"] = self.Fusion(image, fusion_mask)
        seg_recon, _, _ = self.Vae(jax.lax.stop_gradient(init_seg),
                                   if_random=False, scale=0.0)
        out["seg_recon"] = seg_recon
        return out

    def segment(self, image: jax.Array) -> jax.Array:
        """GT-free inference path (Fusion of the latent-decoded init seg) —
        used by the sliding-window evaluator."""
        latent = self.Encoder(image)
        init_seg = self.Vae(latent, mid_input=True)
        return self.Fusion(image, init_seg)
