"""AOT export/load of the inference forward (jax.export + StableHLO).

Artifact layout (one file): magic, then two length-prefixed blobs —
  1. the serialized jax.export artifact of the zero-noise eval forward,
  2. the msgpack-serialized variables pytree (params + batch_stats).
The loader needs only jax + flax.serialization (no fiery_tpu model code), so a
serving host runs the exact compiled graph evaluate.py measures
(reference evaluate.py:56-59: mean prediction, batch-static shapes).
"""

import struct

import numpy as np

_MAGIC = b'FIERYTPU1'


def export_model(cfg, checkpoint: str = '', batch: int = 1, fold_bn: bool = True):
    """Build the eval forward for ``cfg`` and serialize it.

    fold_bn (default): BatchNorm affines are folded into the conv weights and
    baked into the graph as constants (utils/bn_fold.py) — the serving artifact
    contains no normalize ops and its params pytree carries no BN leaves.

    Returns (blob, variables, fn) where ``fn(variables, image, intrinsics,
    extrinsics, future_egomotion)`` is the live (uncompiled-call) reference for
    validation; ``variables`` is whatever pytree ``fn`` expects (the non-BN
    params when folded).
    """
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from jax import export as jexport

    from fiery_tpu.models.fiery import build_fiery
    from fiery_tpu.utils.checkpoint import load_checkpoint

    model = build_fiery(cfg)
    s = cfg.TIME_RECEPTIVE_FIELD + cfg.N_FUTURE_FRAMES
    n = len(cfg.IMAGE.NAMES)
    H, W = cfg.IMAGE.FINAL_DIM
    shapes = {
        'image': (batch, s, n, H, W, 3),
        'intrinsics': (batch, s, n, 3, 3),
        'extrinsics': (batch, s, n, 4, 4),
        'future_egomotion': (batch, s, 6),
    }
    example = {k: jnp.zeros(v, jnp.float32) for k, v in shapes.items()}

    if checkpoint:
        state, _ = load_checkpoint(checkpoint)
        variables = {'params': state.params['model'],
                     'batch_stats': state.batch_stats}
        variables = jax.tree.map(jnp.asarray, variables)
    else:
        variables = model.init({'params': jax.random.key(0)}, example['image'],
                               example['intrinsics'], example['extrinsics'],
                               example['future_egomotion'], None, train=False)

    if fold_bn:
        from fiery_tpu.utils.bn_fold import make_serving_fn
        ex_inputs = tuple(example[k] for k in
                          ['image', 'intrinsics', 'extrinsics',
                           'future_egomotion']) + (None,)
        serve, variables = make_serving_fn(model, jax.device_get(variables),
                                           ex_inputs)

        def fn(variables, image, intrinsics, extrinsics, future_egomotion):
            return serve(variables, image, intrinsics, extrinsics,
                         future_egomotion, None)
    else:
        def fn(variables, image, intrinsics, extrinsics, future_egomotion):
            return model.apply(variables, image, intrinsics, extrinsics,
                               future_egomotion, None, train=False)

    # serving contract: images arrive as RAW uint8 post-crop frames (the loader
    # format); the exported graph contains the on-device ImageNet normalisation
    specs = tuple(
        jax.ShapeDtypeStruct(shapes[k],
                             jnp.uint8 if k == 'image' else jnp.float32)
        for k in ['image', 'intrinsics', 'extrinsics', 'future_egomotion'])
    var_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), variables)
    exported = jexport.export(jax.jit(fn))(var_specs, *specs)
    graph_blob = exported.serialize()
    params_blob = serialization.msgpack_serialize(
        jax.tree.map(np.asarray, variables))

    blob = b''.join([
        _MAGIC,
        struct.pack('<Q', len(graph_blob)), graph_blob,
        struct.pack('<Q', len(params_blob)), params_blob,
    ])
    return blob, variables, fn


def load_exported(path):
    """Load an exported artifact. Returns (fn, params); ``fn(params, image,
    intrinsics, extrinsics, future_egomotion)`` runs the compiled forward."""
    from flax import serialization
    from jax import export as jexport

    with open(path, 'rb') as f:
        data = f.read()
    if not data.startswith(_MAGIC):
        raise ValueError(f'{path} is not a fiery_tpu export artifact')
    off = len(_MAGIC)
    n = struct.unpack_from('<Q', data, off)[0]
    off += 8
    graph_blob = data[off:off + n]
    off += n
    n = struct.unpack_from('<Q', data, off)[0]
    off += 8
    params_blob = data[off:off + n]

    exported = jexport.deserialize(graph_blob)
    params = serialization.msgpack_restore(bytearray(params_blob))

    def fn(params, image, intrinsics, extrinsics, future_egomotion):
        return exported.call(params, image, intrinsics, extrinsics,
                             future_egomotion)

    return fn, params
