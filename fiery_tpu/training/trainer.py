"""Training harness: label preparation, jitted train/eval steps, optimizer.

Replaces the reference's PyTorch-Lightning TrainingModule
(/root/reference/fiery/trainer.py:14-260) with a functional JAX design:
  * state is an explicit pytree (params + uncertainty weights + batch_stats + opt state);
  * the train step is a single pure function, jit/pjit-compiled; data parallelism is
    expressed by sharding the batch axis over a mesh — gradient all-reduce and sync-BN
    come out of GSPMD as XLA collectives (no DDP equivalent needed);
  * Adam lr 3e-4, weight decay 1e-7, global grad-norm clip 5 (reference
    trainer.py:254-260, config.py:121-123, train.py:38).
"""

from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from fiery_tpu.models.fiery import Fiery, FieryConfig, build_fiery
from fiery_tpu.ops.warp import cumulative_warp_features_reverse
from fiery_tpu.training.losses import compute_losses, init_uncertainty_weights


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any                 # {'model': ..., 'uncertainty': ...}
    batch_stats: Any
    opt_state: Any


class Trainer:
    """Owns the model, optimizer and the pure step functions."""

    def __init__(self, cfg, depth_keep=None):
        self.cfg = cfg
        self.model_cfg = FieryConfig.from_cfg(cfg)
        if depth_keep is not None:
            import dataclasses
            self.model_cfg = dataclasses.replace(
                self.model_cfg, depth_keep=tuple(int(k) for k in depth_keep))
        self.model = Fiery(cfg=self.model_cfg)
        self.spatial_extent = self.model_cfg.spatial_extent
        self.receptive_field = self.model_cfg.receptive_field

        # torch.optim.Adam semantics (reference trainer.py:254-260): weight decay is
        # COUPLED L2 — wd*param is added to the (already clipped) gradient before the
        # Adam moment updates — not AdamW's decoupled decay.
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.GRAD_NORM_CLIP),
            optax.add_decayed_weights(cfg.OPTIMIZER.WEIGHT_DECAY),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-cfg.OPTIMIZER.LR),
        )

    # ------------------------------------------------------------------
    def init_state(self, rng, batch):
        """Initialise parameters/batch-stats from an example batch."""
        labels, fdi = self.prepare_future_labels(batch)
        rngs = {'params': rng, 'sample': jax.random.fold_in(rng, 1),
                'dropout': jax.random.fold_in(rng, 2)}
        variables = self.model.init(
            rngs, batch['image'], batch['intrinsics'], batch['extrinsics'],
            batch['future_egomotion'], fdi, train=True)
        params = {
            'model': variables['params'],
            'uncertainty': init_uncertainty_weights(self.cfg.INSTANCE_FLOW.ENABLED),
        }
        batch_stats = variables.get('batch_stats', {})
        opt_state = self.tx.init(params)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          batch_stats=batch_stats, opt_state=opt_state)

    # ------------------------------------------------------------------
    def prepare_future_labels(self, batch):
        """Warp GT labels into the present reference frame and build the future
        distribution conditioning input. Reference: trainer.py:133-191.

        batch label layouts (channels-last): segmentation (b, s, h, w, 1) int,
        instance (b, s, h, w) int, centerness (b, s, h, w, 1), offset (b, s, h, w, 2),
        flow (b, s, h, w, 2).
        """
        cfg = self.cfg
        rf = self.receptive_field
        labels = {}

        if 'warped_label_stack' in batch:
            # The data pipeline pre-warped the stack on the host
            # (data/label_warp.py, cfg DATASET.PREWARP_LABELS): the warp is a
            # pure function of (labels, future_egomotion), so it runs in idle
            # host time instead of ~29 ms of device gathers per step.
            stacked = batch['warped_label_stack']
        else:
            ego = batch['future_egomotion'][:, rf - 1:]

            # All label maps share the same nearest-mode warp grids, so stack them
            # into one channel dimension and pay for a single grid computation +
            # gather per (b, t) instead of five (the per-map version showed up as
            # ~25-30 ms/step of duplicated f32 index/gather fusions in the trace).
            maps = [batch['segmentation'][:, rf - 1:].astype(jnp.float32),
                    batch['instance'][:, rf - 1:].astype(jnp.float32)[..., None],
                    batch['centerness'][:, rf - 1:],
                    batch['offset'][:, rf - 1:]]
            if cfg.INSTANCE_FLOW.ENABLED:
                maps.append(batch['flow'][:, rf - 1:])
            stacked = cumulative_warp_features_reverse(
                jnp.concatenate(maps, axis=-1), ego, mode='nearest',
                spatial_extent=self.spatial_extent)

        labels['segmentation'] = jnp.round(stacked[..., 0]).astype(jnp.int32)
        labels['instance'] = jnp.round(stacked[..., 1]).astype(jnp.int32)
        labels['centerness'] = stacked[..., 2:3]
        labels['offset'] = stacked[..., 3:5]
        if cfg.INSTANCE_FLOW.ENABLED:
            labels['flow'] = stacked[..., 5:7]

        # conditioning input = every warped map except the raw instance ids
        # (reference trainer.py:138-190 concatenates seg/centerness/offset/flow)
        future_distribution_inputs = jnp.concatenate(
            [stacked[..., 0:1], stacked[..., 2:]], axis=-1)
        return labels, future_distribution_inputs

    # ------------------------------------------------------------------
    def train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        """One optimisation step. Pure function of (state, batch, rng) -> (state, metrics)."""
        labels, fdi = self.prepare_future_labels(batch)
        step_rng = jax.random.fold_in(rng, state.step)
        rngs = {'sample': step_rng, 'dropout': jax.random.fold_in(step_rng, 1)}

        def loss_fn(params):
            variables = {'params': params['model'], 'batch_stats': state.batch_stats}
            output, mutated = self.model.apply(
                variables, batch['image'], batch['intrinsics'], batch['extrinsics'],
                batch['future_egomotion'], fdi, train=True,
                rngs=rngs, mutable=['batch_stats'])
            loss_dict = compute_losses(output, labels, params['uncertainty'], self.cfg)
            total = sum(loss_dict.values())
            return total, (loss_dict, mutated['batch_stats'], output)

        (total, (loss_dict, new_batch_stats, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_batch_stats, opt_state=new_opt_state)
        metrics = dict(loss_dict)
        metrics['total_loss'] = total
        return new_state, metrics

    # ------------------------------------------------------------------
    def eval_step(self, state: TrainState, batch, noise: Optional[jnp.ndarray] = None):
        """Forward with zero latent noise + losses; returns (output, labels, loss_dict).

        Reference: shared_step(is_train=False) + evaluate.py:56-59.
        """
        labels, fdi = self.prepare_future_labels(batch)
        variables = {'params': state.params['model'], 'batch_stats': state.batch_stats}
        output = self.model.apply(
            variables, batch['image'], batch['intrinsics'], batch['extrinsics'],
            batch['future_egomotion'], fdi, noise=noise, train=False)
        loss_dict = compute_losses(output, labels, state.params['uncertainty'], self.cfg)
        return output, labels, loss_dict

    # ------------------------------------------------------------------
    def predict_step(self, state: TrainState, batch):
        """Inference without future labels (visualise.py path)."""
        variables = {'params': state.params['model'], 'batch_stats': state.batch_stats}
        return self.model.apply(
            variables, batch['image'], batch['intrinsics'], batch['extrinsics'],
            batch['future_egomotion'], None, train=False)
