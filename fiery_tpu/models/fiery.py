"""Top-level FIERY model as a flax module over NHWC tensors.

Wires encoder -> lift-splat -> ego-motion warp -> temporal model -> probabilistic
latent -> GRU rollout -> decoder, mirroring the reference graph
(/root/reference/fiery/models/fiery.py:13-339) with TPU-native ops:
  * the voxel pooling is a fixed-shape segment-sum splat (ops/lift_splat.py) instead of
    the reference's per-sample mask/sort/cumsum python loop (fiery.py:221-273);
  * warps are pure-jnp gathers (ops/warp.py);
  * noise is threaded through flax RNG collections ('sample') instead of torch randn.

Tensor conventions (channels-last everywhere):
  image (b, s, n, H, W, 3), intrinsics (b, s, n, 3, 3), extrinsics (b, s, n, 4, 4),
  future_egomotion (b, s, 6), BEV states (b, t, X, Y, C),
  outputs: segmentation (b, t, X, Y, n_classes), instance_center (b, t, X, Y, 1),
  instance_offset / instance_flow (b, t, X, Y, 2), distribution mus/sigmas (b, 1, L).
"""

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fiery_tpu.models.decoder import Decoder
from fiery_tpu.models.distributions import DistributionModule
from fiery_tpu.models.encoder import Encoder
from fiery_tpu.models.future_prediction import FuturePrediction
from fiery_tpu.models.temporal_model import (
    TemporalModel,
    TemporalModelIdentity,
    temporal_out_channels,
)
from fiery_tpu.ops.lift_splat import (
    create_frustum, get_geometry, lift_splat, lift_splat_topk)
from fiery_tpu.parallel.mesh import bev_constraint
from fiery_tpu.ops.warp import (
    compose_poses_to_present, cumulative_warp_features, warp_points_to_present)
from fiery_tpu.utils.geometry import (
    calculate_birds_eye_view_parameters,
    pack_sequence_dim,
    unpack_sequence_dim,
)

# ImageNet statistics of the reference preprocessing (reference data.py:53-57);
# duplicated from fiery_tpu.data.nuscenes_dataset to keep models free of
# data-plane imports — used for on-device normalisation of RAW uint8 batches.
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class FieryConfig:
    """Static (hashable) model configuration distilled from the CfgNode."""
    time_receptive_field: int = 3
    n_future_frames: int = 4
    subsample: bool = False
    final_dim: Tuple[int, int] = (224, 480)
    x_bound: Tuple[float, float, float] = (-50.0, 50.0, 0.5)
    y_bound: Tuple[float, float, float] = (-50.0, 50.0, 0.5)
    z_bound: Tuple[float, float, float] = (-10.0, 10.0, 20.0)
    d_bound: Tuple[float, float, float] = (2.0, 50.0, 1.0)
    encoder_downsample: int = 8
    encoder_name: str = 'efficientnet-b4'
    encoder_out_channels: int = 64
    use_depth_distribution: bool = True
    temporal_name: str = 'temporal_block'
    start_out_channels: int = 64
    extra_in_channels: int = 0
    inbetween_layers: int = 0
    pyramid_pooling: bool = True
    input_egopose: bool = True
    latent_dim: int = 32
    min_log_sigma: float = -5.0
    max_log_sigma: float = 5.0
    n_gru_blocks: int = 3
    n_res_layers: int = 3
    bn_momentum: float = 0.1
    n_classes: int = 2
    instance_flow_enabled: bool = True
    probabilistic_enabled: bool = True
    probabilistic_future_dim: int = 6
    precision: int = 32   # 16 -> bf16 compute (params stay f32; BN stats f32)
    remat_lift: bool = True   # rematerialise encoder+splat in backward (saves ~3 GB)
    # static per-camera kept depth-plane counts (ops/lift_splat.py
    # compute_depth_plane_keep); None = splat every plane. Set via
    # Trainer(cfg, depth_keep=...) when cfg.LIFT.DEPTH_CULL is on.
    depth_keep: Optional[Tuple[int, ...]] = None
    # sparse splat: keep only the top-k depth bins per pixel (cfg LIFT.TOPK;
    # 0 = dense exact splat). Approximate — see ops/lift_splat.py lift_splat_topk.
    depth_topk: int = 0
    # trim the temporal stack to the causal minimum during TRAINING too (cfg
    # MODEL.TEMPORAL_MODEL.TRIM_TRAIN): BN batch statistics are then computed
    # over the kept frames only — off the parity path (eval-time trimming is
    # exact and always on; see temporal_model.py).
    temporal_trim_train: bool = False
    # warp-free lift (cfg LIFT.WARP_FREE): fold the composed ego-motion poses into
    # the lift geometry so past frames splat DIRECTLY into the present BEV grid —
    # the post-splat bilinear feature warp (and its backward scatter) disappears
    # from the graph. Same continuous-space maths as splat+warp but a different
    # discretisation (bin assignment instead of bilinear blur), so it is off the
    # reference-parity path, like LIFT.TOPK.
    warp_free: bool = False

    def __post_init__(self):
        if self.subsample:
            # Lyft subsampling hardcodes receptive_field 3 / n_future 5
            # (reference fiery.py:39-42): the ::2-subsampled window must hold
            # exactly those 8 frames, i.e. TIME_RECEPTIVE_FIELD 5 +
            # N_FUTURE_FRAMES 10 (15 keyframes -> 8). Anything else crashes
            # deep in label slicing — reject it at the config surface.
            window = self.time_receptive_field + self.n_future_frames
            if (window + 1) // 2 != 8:
                raise ValueError(
                    f'MODEL.SUBSAMPLE expects TIME_RECEPTIVE_FIELD 5 and '
                    f'N_FUTURE_FRAMES 10 (the reference hardcodes the '
                    f'subsampled receptive_field=3/n_future=5): got a '
                    f'{window}-keyframe window -> {(window + 1) // 2} '
                    f'subsampled frames, need 8.')
        H, W = self.final_dim
        if H % 16 or W % 16:
            raise ValueError(
                f'IMAGE.FINAL_DIM must be divisible by 16 (got {self.final_dim}): the '
                f'encoder FPN upsamples the stride-16 endpoint by exactly 2x onto the '
                f'stride-8 endpoint.')
        if self.depth_topk:
            if not 0 < self.depth_topk <= self.depth_channels:
                raise ValueError(
                    f'LIFT.TOPK must be in [1, D={self.depth_channels}] '
                    f'(got {self.depth_topk})')
            if self.depth_keep is not None:
                raise ValueError('LIFT.TOPK and LIFT.DEPTH_CULL are exclusive: '
                                 'the sparse top-k splat already drops '
                                 'out-of-bounds mass via the dump bin.')
            if self.depth_topk % 8:
                # Measured toolchain fault, not a style rule: the full train
                # step at topk=4 dies with a Mosaic kernel fault (UNAVAILABLE)
                # deterministically on TPU v5e, while k=8 runs fine. CPU tests
                # with small k are unaffected (warning only, no raise).
                import warnings
                warnings.warn(
                    f'LIFT.TOPK={self.depth_topk} is not a multiple of 8: the '
                    f'fused sparse-splat train step is known to fault the TPU '
                    f'on this toolchain for sublane-sized k (measured at k=4). '
                    f'Use k=8 or a multiple of 8 on real hardware.')
        if self.warp_free and self.depth_keep is not None:
            raise ValueError(
                'LIFT.WARP_FREE and LIFT.DEPTH_CULL are exclusive: the static '
                'culling envelope is computed in per-frame grid coordinates and '
                'does not account for the ego motion folded into the geometry.')

    @classmethod
    def from_cfg(cls, cfg):
        """Build from a CfgNode (fiery_tpu.utils.config.get_cfg())."""
        # Reject contradictory cfg combinations here, at the user-facing surface:
        # the depth_keep counts themselves are rig-dependent and only computed
        # later (train.py), so the __post_init__ depth_keep guards would fire
        # only at Trainer construction.
        if cfg.LIFT.DEPTH_CULL and (cfg.LIFT.TOPK or cfg.LIFT.WARP_FREE):
            raise ValueError(
                'LIFT.DEPTH_CULL is exclusive with LIFT.TOPK (the sparse splat '
                'already drops out-of-bounds mass via the dump bin) and with '
                'LIFT.WARP_FREE (the static culling envelope is computed in '
                'per-frame grid coordinates and does not account for the ego '
                'motion folded into the geometry).')
        return cls(
            time_receptive_field=cfg.TIME_RECEPTIVE_FIELD,
            n_future_frames=cfg.N_FUTURE_FRAMES,
            subsample=cfg.MODEL.SUBSAMPLE,
            final_dim=tuple(cfg.IMAGE.FINAL_DIM),
            x_bound=tuple(cfg.LIFT.X_BOUND),
            y_bound=tuple(cfg.LIFT.Y_BOUND),
            z_bound=tuple(cfg.LIFT.Z_BOUND),
            d_bound=tuple(cfg.LIFT.D_BOUND),
            encoder_downsample=cfg.MODEL.ENCODER.DOWNSAMPLE,
            encoder_name=cfg.MODEL.ENCODER.NAME,
            encoder_out_channels=cfg.MODEL.ENCODER.OUT_CHANNELS,
            use_depth_distribution=cfg.MODEL.ENCODER.USE_DEPTH_DISTRIBUTION,
            depth_topk=cfg.LIFT.TOPK,
            warp_free=cfg.LIFT.WARP_FREE,
            temporal_trim_train=cfg.MODEL.TEMPORAL_MODEL.TRIM_TRAIN,
            temporal_name=cfg.MODEL.TEMPORAL_MODEL.NAME,
            start_out_channels=cfg.MODEL.TEMPORAL_MODEL.START_OUT_CHANNELS,
            extra_in_channels=cfg.MODEL.TEMPORAL_MODEL.EXTRA_IN_CHANNELS,
            inbetween_layers=cfg.MODEL.TEMPORAL_MODEL.INBETWEEN_LAYERS,
            pyramid_pooling=cfg.MODEL.TEMPORAL_MODEL.PYRAMID_POOLING,
            input_egopose=cfg.MODEL.TEMPORAL_MODEL.INPUT_EGOPOSE,
            latent_dim=cfg.MODEL.DISTRIBUTION.LATENT_DIM,
            min_log_sigma=cfg.MODEL.DISTRIBUTION.MIN_LOG_SIGMA,
            max_log_sigma=cfg.MODEL.DISTRIBUTION.MAX_LOG_SIGMA,
            n_gru_blocks=cfg.MODEL.FUTURE_PRED.N_GRU_BLOCKS,
            n_res_layers=cfg.MODEL.FUTURE_PRED.N_RES_LAYERS,
            bn_momentum=cfg.MODEL.BN_MOMENTUM,
            n_classes=len(cfg.SEMANTIC_SEG.WEIGHTS),
            instance_flow_enabled=cfg.INSTANCE_FLOW.ENABLED,
            probabilistic_enabled=cfg.PROBABILISTIC.ENABLED,
            probabilistic_future_dim=cfg.PROBABILISTIC.FUTURE_DIM,
            precision=cfg.PRECISION,
        )

    # -- derived static properties ----------------------------------------
    @property
    def receptive_field(self):
        # Lyft subsampling halves the effective sequence (reference fiery.py:39-42)
        return 3 if self.subsample else self.time_receptive_field

    @property
    def n_future(self):
        return 5 if self.subsample else self.n_future_frames

    @property
    def spatial_extent(self):
        return (self.x_bound[1], self.y_bound[1])

    @property
    def bev_parameters(self):
        return calculate_birds_eye_view_parameters(self.x_bound, self.y_bound, self.z_bound)

    @property
    def bev_size(self):
        _, _, dim = self.bev_parameters
        return (int(dim[0]), int(dim[1]))

    @property
    def depth_channels(self):
        return int((self.d_bound[1] - self.d_bound[0]) / self.d_bound[2])

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.precision == 16 else jnp.float32


class BEVLift(nn.Module):
    """Encoder + depth-outer-product + voxel splat for one packed frame batch.

    The encoder is wrapped with nn.remat (cfg.remat_lift): its EfficientNet
    activations and the (BN*n, h, w, D, C) lifted volume are recomputed during
    backward (the encoder replay costs ~2 ms at baseline shapes), while the splat
    stays OUTSIDE the remat boundary so its expensive scatter is not replayed.
    """
    cfg: FieryConfig

    @nn.compact
    def __call__(self, images, geometry, train: bool = False):
        # images: (b*s, n, H, W, 3); geometry: (b*s, n, D, h, w, 3)
        c = self.cfg
        bs, n = images.shape[:2]
        # save_only_these_names('bn_stats'): the per-channel BN statistics (tagged in
        # layers._BNCore) survive the remat boundary, so the backward replay skips
        # every full-activation BN reduction — everything else is recomputed as usual.
        encoder_cls = (nn.remat(
            Encoder, static_argnums=(2, 3),
            policy=jax.checkpoint_policies.save_only_these_names('bn_stats'))
            if c.remat_lift else Encoder)
        encoder = encoder_cls(
            out_channels=c.encoder_out_channels,
            depth_channels=c.depth_channels,
            version=c.encoder_name.split('-')[1],
            downsample=c.encoder_downsample,
            use_depth_distribution=c.use_depth_distribution,
            bn_momentum=c.bn_momentum,
            dtype=c.compute_dtype,
            name='encoder',
        )
        res, start, dim = c.bev_parameters
        if c.depth_topk:
            # sparse top-k splat: the encoder returns (depth, feat) unlifted; only
            # the k highest-mass depth bins per pixel enter the scatter
            depth, feat = encoder(images.reshape(bs * n, *images.shape[2:]),
                                  train, True)
            depth = depth.reshape(bs, n, *depth.shape[1:])   # (b*s, n, h, w, D)
            feat = feat.reshape(bs, n, *feat.shape[1:])      # (b*s, n, h, w, C)
            return lift_splat_topk(depth, feat, geometry.astype(feat.dtype),
                                   c.depth_topk, res, start, dim)
        feats = encoder(images.reshape(bs * n, *images.shape[2:]), train, False)
        feats = feats.reshape(bs, n, *feats.shape[1:])       # (b*s, n, h, w, D, C)
        return lift_splat(feats, geometry.astype(feats.dtype), res, start, dim,
                          depth_keep=c.depth_keep)


class Fiery(nn.Module):
    cfg: FieryConfig

    def setup(self):
        c = self.cfg
        dtype = c.compute_dtype
        self.frustum = jnp.asarray(
            create_frustum(c.final_dim, c.encoder_downsample, c.d_bound))

        self.bev_lift = BEVLift(cfg=c, name='bev_lift')

        # FIERY_PACKED_SPACE=k runs the GRU rollout (and, with
        # FIERY_PACKED_TEMPORAL=1, the temporal stack) on the (H, W/k, k*C)
        # space-to-channel packed view (models/packed.py): exact same
        # math/params, full 128-lane HBM buffers. Read at module
        # construction; use a fresh model object after flipping the flags.
        # Measured (tools/packed_space_ab.py, back-to-back): GRU-only packing
        # took dense 491.2 -> 443.7 ms (+10.7%) and the topk8+warp-free combo
        # 374.2 -> 327.3 (+14.3%); k=4 was WORSE (the k-fold packed-conv FLOPs
        # overtake the byte savings) — default k=2. Temporal-stack packing is
        # gated separately (its C=70 buffers don't lane-fill at k=2; the C=35
        # mids and the fused epilogues do): measured dense 444.1 -> 435.0 ms
        # (+2.1%) and combo 327.4 -> 315.9 (+3.6%) — default ON.
        import os as _os
        packed_k = int(_os.environ.get('FIERY_PACKED_SPACE', '2') or 0)
        if packed_k > 1 and c.bev_size[1] % packed_k:
            packed_k = 1
        packed_k = max(packed_k, 1)
        packed_k_temporal = (
            packed_k if _os.environ.get('FIERY_PACKED_TEMPORAL', '1') == '1'
            else 1)
        # Decoder packing (strided/mixed-k kernels, single-buffer fused heads):
        # measured dense 444.4 -> 437.7 ms (+1.5%), combo 329.5 -> 320.7
        # (+2.8%) on top of GRU packing — default ON.
        packed_k_decoder = (
            packed_k if _os.environ.get('FIERY_PACKED_DECODER', '1') == '1'
            else 1)
        # Serving (train=False) packing, selected at CALL time by the modules'
        # packed_k_eval. ROUND-5 REVERSAL: the round-4 "packed serving
        # regresses to 27.1 vs 32.5 clips/s" came from the broken
        # block_until_ready sync; with trusted scalar-pull timing a
        # one-process A-B-A-B measures packed serving at 39.9/39.7 vs
        # unpacked 33.7/33.7 clips/s (+18%, topk8+warp-free bf16 batch 1
        # BN-folded; e2e 24.0 vs 22.3) — the packed VALUES still save padded
        # HBM bytes even with BN folded. Default: eval runs PACKED k=2
        # (FIERY_PACKED_SPACE_EVAL=2; set 1 to serve unpacked); the lowering
        # is exact either way, so train/eval may differ freely.
        packed_k_eval = int(
            _os.environ.get('FIERY_PACKED_SPACE_EVAL', '2') or 0)
        if packed_k_eval > 1 and c.bev_size[1] % packed_k_eval:
            packed_k_eval = 1
        packed_k_eval = max(packed_k_eval, 1)

        temporal_in_channels = c.encoder_out_channels + (6 if c.input_egopose else 0)
        if c.temporal_name == 'identity':
            self.temporal_model = TemporalModelIdentity(receptive_field=c.receptive_field)
        elif c.temporal_name == 'temporal_block':
            self.temporal_model = TemporalModel(
                receptive_field=c.receptive_field,
                input_shape=c.bev_size,
                start_out_channels=c.start_out_channels,
                extra_in_channels=c.extra_in_channels,
                n_spatial_layers_between_temporal_layers=c.inbetween_layers,
                use_pyramid_pooling=c.pyramid_pooling,
                bn_momentum=c.bn_momentum,
                dtype=dtype,
                packed_k=packed_k_temporal,
                packed_k_eval=min(packed_k_eval, packed_k_temporal),
            )
        else:
            raise NotImplementedError(f'Temporal module {c.temporal_name}')

        self.future_pred_in_channels = temporal_out_channels(
            c.temporal_name, temporal_in_channels, c.receptive_field,
            c.start_out_channels, c.extra_in_channels)

        if c.n_future > 0:
            if c.probabilistic_enabled:
                self.present_distribution = DistributionModule(
                    latent_dim=c.latent_dim, min_log_sigma=c.min_log_sigma,
                    max_log_sigma=c.max_log_sigma, bn_momentum=c.bn_momentum,
                    dtype=dtype)
                self.future_distribution = DistributionModule(
                    latent_dim=c.latent_dim, min_log_sigma=c.min_log_sigma,
                    max_log_sigma=c.max_log_sigma, bn_momentum=c.bn_momentum,
                    dtype=dtype)
            self.future_prediction = FuturePrediction(
                in_channels=self.future_pred_in_channels,
                n_gru_blocks=c.n_gru_blocks, n_res_layers=c.n_res_layers,
                bn_momentum=c.bn_momentum, dtype=dtype,
                packed_k=packed_k,
                packed_k_eval=min(packed_k_eval, packed_k))

        self.decoder = Decoder(
            n_classes=c.n_classes,
            predict_future_flow=c.instance_flow_enabled,
            bn_momentum=c.bn_momentum,
            dtype=dtype,
            packed_k=packed_k_decoder,
            packed_k_eval=min(packed_k_eval, packed_k_decoder),
        )

    def __call__(self, image, intrinsics, extrinsics, future_egomotion,
                 future_distribution_inputs=None, noise=None, train: bool = False):
        c = self.cfg
        rf = c.receptive_field
        output = {}

        # only past + present frames feed perception (reference fiery.py:134-137)
        image = image[:, :rf]
        if image.dtype == jnp.uint8:
            # loaders may ship RAW uint8 crops (4x less host->device traffic; the
            # uint8 post-resize/crop frame is the exact reference intermediate,
            # data.py:211-219) — ImageNet-normalise on device in f32, identical
            # math to the host normalisation of the f32 path
            image = ((image.astype(jnp.float32) / 255.0 - _IMAGENET_MEAN)
                     / _IMAGENET_STD)
        image = image.astype(c.compute_dtype)
        intrinsics = intrinsics[:, :rf]
        extrinsics = extrinsics[:, :rf]
        future_egomotion_in = future_egomotion[:, :rf]

        x = self.calculate_birds_eye_view_features(
            image, intrinsics, extrinsics, train,
            egomotion=future_egomotion_in if c.warp_free else None)

        if not c.warp_free:
            # warp past BEV features to the present frame (reference fiery.py:143-146)
            x = cumulative_warp_features(
                x, future_egomotion_in, mode='bilinear', spatial_extent=c.spatial_extent)

        if c.input_egopose:
            b, s = future_egomotion_in.shape[:2]
            h, w = x.shape[2:4]
            ego = jnp.broadcast_to(future_egomotion_in[:, :, None, None, :], (b, s, h, w, 6))
            # at time 0 there is no egomotion: shift right, zero-fill (fiery.py:153-154)
            ego = jnp.concatenate([jnp.zeros_like(ego[:, :1]), ego[:, :rf - 1]], axis=1)
            x = jnp.concatenate([x, ego.astype(x.dtype)], axis=-1)

        # BEV spatial partitioning (parallel/mesh.py bev_sharding): identity
        # unless the trainer enabled it — then the X row axis rides 'model'
        x = bev_constraint(x)

        # At eval the temporal stack is trimmed to the causal minimum: only the
        # present frame survives the final slice, so each block emits one frame
        # fewer than its input (exact under running-stat BN — temporal_model.py).
        # TRIM_TRAIN extends it to training (approximate: BN batch stats).
        trim = (not train) or c.temporal_trim_train
        if trim and isinstance(self.temporal_model, TemporalModel):
            states = self.temporal_model(x, train, trim=True)
        else:
            states = self.temporal_model(x, train)
        states = bev_constraint(states)

        if c.n_future > 0:
            present_state = states[:, :1]
            if c.probabilistic_enabled:
                sample, output_distribution = self.distribution_forward(
                    present_state, future_distribution_inputs, noise, train)
                output.update(output_distribution)

            b, _, h, w, _ = present_state.shape
            hidden_state = bev_constraint(present_state[:, 0])

            if c.probabilistic_enabled:
                future_prediction_input = jnp.broadcast_to(
                    sample, (b, c.n_future, h, w, c.latent_dim))
            else:
                future_prediction_input = jnp.zeros(
                    (b, c.n_future, h, w, c.latent_dim), dtype=hidden_state.dtype)

            future_states = self.future_prediction(
                bev_constraint(future_prediction_input), hidden_state, train)
            future_states = bev_constraint(
                jnp.concatenate([present_state, future_states], axis=1))
            bev_output = self.decoder(future_states, train)
        else:
            bev_output = self.decoder(states[:, -1:], train)

        # heads and losses consume float32 regardless of the compute dtype
        output.update(jax.tree.map(
            lambda t: bev_constraint(t.astype(jnp.float32)) if t is not None else None,
            bev_output, is_leaf=lambda t: t is None))
        return output

    def calculate_birds_eye_view_features(self, x, intrinsics, extrinsics, train,
                                          egomotion=None):
        """(b, s, n, H, W, 3) images -> (b, s, X, Y, C) BEV features.

        Reference: fiery.py:275-286. With ``egomotion`` (the warp-free lift,
        cfg LIFT.WARP_FREE) the composed frame->present poses are applied to the
        lift geometry, so every past frame splats directly into the present-frame
        BEV grid and no post-splat feature warp is needed.
        """
        c = self.cfg
        b, s, n = x.shape[:3]
        x = pack_sequence_dim(x)                   # (b*s, n, H, W, 3)
        intrinsics = pack_sequence_dim(intrinsics)
        extrinsics = pack_sequence_dim(extrinsics)

        geometry = get_geometry(self.frustum, intrinsics, extrinsics)  # (b*s, n, D, h, w, 3)
        if egomotion is not None and s > 1:
            geometry = unpack_sequence_dim(geometry, b, s)
            poses = compose_poses_to_present(egomotion)        # (b, s-1, 6)
            past = pack_sequence_dim(geometry[:, :-1])         # (b*(s-1), n, D, h, w, 3)
            xy = warp_points_to_present(
                past[..., :2], pack_sequence_dim(poses),
                spatial_extent=c.spatial_extent,
                bev_bounds=(c.x_bound[:2], c.y_bound[:2]))
            past = jnp.concatenate([xy, past[..., 2:]], axis=-1)
            geometry = jnp.concatenate(
                [unpack_sequence_dim(past, b, s - 1), geometry[:, -1:]], axis=1)
            geometry = pack_sequence_dim(geometry)
        bev = self.bev_lift(x, geometry, train)
        return bev_constraint(unpack_sequence_dim(bev, b, s))  # (b, s, X, Y, C)

    def distribution_forward(self, present_features, future_distribution_inputs,
                             noise, train):
        """Sample the latent; train -> future distribution, eval -> present mean.

        Reference: fiery.py:288-339.
        """
        c = self.cfg
        b, s, h, w, _ = present_features.shape
        assert s == 1

        present_mu, present_log_sigma = self.present_distribution(present_features, train)

        future_mu, future_log_sigma = None, None
        if future_distribution_inputs is not None:
            # flatten future label frames (skip present) into channels (fiery.py:312)
            fdi = future_distribution_inputs[:, 1:]
            fdi = jnp.moveaxis(fdi, 1, -2).reshape(b, h, w, -1)[:, None]
            future_features = jnp.concatenate([present_features, fdi.astype(
                present_features.dtype)], axis=-1)
            future_mu, future_log_sigma = self.future_distribution(future_features, train)

        if noise is None:
            if train:
                noise = jax.random.normal(self.make_rng('sample'), present_mu.shape,
                                          dtype=present_mu.dtype)
            else:
                noise = jnp.zeros_like(present_mu)
        if train:
            mu, sigma = future_mu, jnp.exp(future_log_sigma)
        else:
            mu, sigma = present_mu, jnp.exp(present_log_sigma)
        sample = mu + sigma * noise                       # (b, 1, latent)

        # spatial broadcast to (b, 1, h, w, latent)
        sample = jnp.broadcast_to(sample[:, :, None, None, :],
                                  (b, 1, h, w, c.latent_dim))

        output_distribution = {
            'present_mu': present_mu,
            'present_log_sigma': present_log_sigma,
            'future_mu': future_mu,
            'future_log_sigma': future_log_sigma,
        }
        return sample, output_distribution


def build_fiery(cfg):
    """Construct a Fiery module from a CfgNode."""
    return Fiery(cfg=FieryConfig.from_cfg(cfg))
