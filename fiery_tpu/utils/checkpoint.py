"""Checkpoint save/load via orbax.

Replaces Lightning checkpointing (reference train.py:29-32, trainer.py:19-22,
evaluate.py:19): a checkpoint stores the full TrainState pytree plus the config dict,
so evaluation can rebuild the exact model from the checkpoint alone (the reference
stores hparams in the ckpt and rebuilds cfg from them).
"""

import json
import os
import threading

import jax
import numpy as np
import orbax.checkpoint as ocp

from fiery_tpu.training.trainer import TrainState
from fiery_tpu.utils.config import get_cfg

_STATE_DIR = 'state'
_CFG_FILE = 'config.json'
_async_lock = threading.Lock()
_async_thread = [None]


def save_checkpoint(path, state, cfg):
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        state_path = os.path.join(path, _STATE_DIR)
        state_host = jax.tree.map(np.asarray, jax.device_get(state))
        ckptr.save(state_path, state_host, force=True)
    with open(os.path.join(path, _CFG_FILE), 'w') as f:
        json.dump(cfg.convert_to_dict(), f, indent=2)


def save_checkpoint_async(path, state, cfg):
    """Non-blocking checkpoint: device->host transfer happens now, the disk write on a
    background thread (one in flight at a time — preemption-tolerant training saves
    without stalling the step loop; the reference has no async story, Lightning blocks).
    """
    state_host = jax.tree.map(np.asarray, jax.device_get(state))
    cfg_dict = cfg.convert_to_dict()

    def write():
        with _async_lock:
            p = os.path.abspath(path)
            os.makedirs(p, exist_ok=True)
            with ocp.PyTreeCheckpointer() as ckptr:
                ckptr.save(os.path.join(p, _STATE_DIR), state_host, force=True)
            with open(os.path.join(p, _CFG_FILE), 'w') as f:
                json.dump(cfg_dict, f, indent=2)

    wait_for_async_save()
    t = threading.Thread(target=write, daemon=True)
    _async_thread[0] = t
    t.start()


def wait_for_async_save():
    t = _async_thread[0]
    if t is not None and t.is_alive():
        t.join()


def _is_checkpoint_dir(path):
    """A checkpoint is complete iff both the state dir and the config marker
    exist — config.json is written LAST in both save paths, so its presence
    commits the checkpoint (a preempted async write leaves no config.json and
    the directory is skipped by auto-resume)."""
    return (os.path.isdir(os.path.join(path, _STATE_DIR))
            and os.path.isfile(os.path.join(path, _CFG_FILE)))


def find_latest_checkpoint(path):
    """Resolve ``path`` to a concrete, complete checkpoint directory.

    Accepts (preemption-tolerant auto-resume, SURVEY §5):
      * a checkpoint dir itself (contains ``state/`` + ``config.json``);
      * a RUN dir containing ``checkpoint_epochN``/``checkpoint_final``
        subdirs — picks ``checkpoint_final`` if complete, else the highest
        complete epoch;
      * a LOG dir of run dirs — picks the most recently modified run dir
        that holds a complete checkpoint.
    Returns None if no complete checkpoint is found.
    """
    path = os.path.abspath(path)
    if _is_checkpoint_dir(path):
        return path
    if not os.path.isdir(path):
        return None
    final = os.path.join(path, 'checkpoint_final')
    if _is_checkpoint_dir(final):
        return final
    epochs = []
    for name in os.listdir(path):
        if name.startswith('checkpoint_epoch'):
            try:
                n = int(name[len('checkpoint_epoch'):])
            except ValueError:
                continue
            if _is_checkpoint_dir(os.path.join(path, name)):
                epochs.append(n)
    if epochs:
        return os.path.join(path, f'checkpoint_epoch{max(epochs)}')
    # a log dir of run dirs: newest run with a complete checkpoint wins
    runs = sorted((os.path.join(path, d) for d in os.listdir(path)
                   if os.path.isdir(os.path.join(path, d))),
                  key=os.path.getmtime, reverse=True)
    for run in runs:
        found = find_latest_checkpoint(run)
        if found:
            return found
    return None


def load_checkpoint(path, state_template=None):
    """Returns (state, cfg).

    Orbax restores the pytree with dicts in place of the optax NamedTuples
    inside ``opt_state`` — fine for eval (params/batch_stats are plain dicts)
    but a resumed ``train_step`` would crash on ``opt_state.mu``. Pass
    ``state_template`` (any TrainState with the right structure, e.g. the one
    ``trainer.init_state`` built) to cast the restored leaves back onto the
    real structure; resume paths must do this."""
    path = os.path.abspath(path)
    with open(os.path.join(path, _CFG_FILE)) as f:
        # non-strict: a renamed/removed default key must not make old ckpts unloadable
        cfg = get_cfg(cfg_dict=json.load(f), cfg_dict_strict=False)
    with ocp.PyTreeCheckpointer() as ckptr:
        if state_template is not None:
            template = jax.tree.map(np.asarray, jax.device_get(state_template))
            return ckptr.restore(os.path.join(path, _STATE_DIR),
                                 item=template), cfg
        restored = ckptr.restore(os.path.join(path, _STATE_DIR))
    state = TrainState(
        step=restored['step'], params=restored['params'],
        batch_stats=restored['batch_stats'], opt_state=restored['opt_state'])
    return state, cfg


def load_torch_pretrained(path, state, model_cfg):
    """Warm start from a torch ``.pth``/``.ckpt`` file.

    Two accepted formats:
      * a STANDALONE ImageNet EfficientNet state dict (efficientnet_pytorch naming,
        keys like ``_conv_stem.weight``) — loads only the encoder backbone, the TPU
        equivalent of the reference's default ImageNet init (encoder.py:16);
      * a full reference FIERY checkpoint (Lightning ``state_dict`` with
        ``model.encoder.backbone...`` keys) — loads everything the importer maps.
    """
    import torch
    from fiery_tpu.utils.weight_import import (import_efficientnet_state_dict,
                                               import_torch_state_dict,
                                               merge_subtree)
    blob = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(blob, dict) and 'state_dict' in blob:
        blob = blob['state_dict']
    sd = {k: np.asarray(v) for k, v in blob.items()
          if hasattr(v, 'shape') or np.isscalar(v)}

    if any(k.startswith(('_conv_stem', '_blocks.')) for k in sd):
        converted = import_efficientnet_state_dict(sd, model_cfg)
        uncertainty = {}
    else:
        converted, uncertainty = import_torch_state_dict(sd, model_cfg, strict=False)

    params = jax.device_get(state.params)
    params['model'] = merge_subtree(params['model'], converted['params'])
    for k, v in uncertainty.items():
        if k in params.get('uncertainty', {}):
            params['uncertainty'][k] = np.asarray(v)
    batch_stats = merge_subtree(jax.device_get(state.batch_stats),
                                converted['batch_stats'])
    return state.replace(params=params, batch_stats=batch_stats)


def load_torch_full_checkpoint(path, cfg_overrides=None):
    """Restore (state, cfg) directly from a reference Lightning checkpoint.

    The accuracy-parity entry point (reference evaluate.py:19 does
    ``TrainingModule.load_from_checkpoint(fiery.ckpt)``): the config is rebuilt
    from the checkpoint's ``hyper_parameters`` dict (the reference stores
    cfg.convert_to_dict() there, trainer.py:19-22; our YAML key schema is
    identical) with a non-strict merge, a TrainState is initialised at the
    configured shapes, and every weight the importer maps (all of them for a
    reference FIERY state_dict) is loaded. Returns (state, cfg)."""
    import torch

    import jax.numpy as jnp
    from fiery_tpu.data.synthetic import SyntheticFutureDataset
    from fiery_tpu.training.trainer import Trainer

    blob = torch.load(path, map_location='cpu', weights_only=False)
    hparams = {}
    if isinstance(blob, dict):
        hparams = blob.get('hyper_parameters') or blob.get('hparams') or {}
    cfg = get_cfg(cfg_dict=dict(hparams), cfg_dict_strict=False)
    if cfg_overrides:
        cfg.merge_from_dict(cfg_overrides)

    trainer = Trainer(cfg)
    ds = SyntheticFutureDataset(cfg, n_samples=1, n_instances=1, seed=0)
    batch = {k: jnp.asarray(v) for k, v in ds.get_batch([0]).items()}
    state = jax.jit(trainer.init_state)(jax.random.key(0), batch)
    state = load_torch_pretrained(path, state, trainer.model_cfg)
    return state, cfg


def load_pretrained_params(path, state, model_cfg=None):
    """Partial warm start (reference train.py:20-27, strict=False): copy matching
    entries from a checkpoint's params into ``state``, keep the rest.

    ``path`` may be an orbax checkpoint dir or a torch ``.pth``/``.pt``/``.ckpt``
    file (see load_torch_pretrained)."""
    if path.endswith(('.pth', '.pt', '.ckpt')):
        if model_cfg is None:
            raise ValueError('model_cfg required to import a torch checkpoint')
        return load_torch_pretrained(path, state, model_cfg)
    restored, _ = load_checkpoint(path)

    def merge(dst, src):
        out = {}
        for k, v in dst.items():
            if k in src and isinstance(v, dict):
                out[k] = merge(v, src[k])
            elif k in src and getattr(src[k], 'shape', None) == getattr(v, 'shape', None):
                out[k] = src[k]
            else:
                out[k] = v
        return out

    new_params = merge(jax.device_get(state.params), jax.device_get(restored.params))
    return state.replace(params=new_params)
