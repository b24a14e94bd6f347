"""Export the inference forward as a portable AOT artifact (jax.export).

Serving-oriented entry point with no reference equivalent (the reference stops at
evaluate.py/visualise.py): serialises the zero-noise eval forward — the exact
protocol evaluate.py measures (reference evaluate.py:56-59) — as a StableHLO
artifact plus the parameter pytree, so a serving host can run the model without
the fiery_tpu Python stack:

    python export.py --checkpoint <ckpt_dir> --output model.fiery [--batch 1]
    python export.py --output model.fiery --validate        # random init + check

Load side (any machine with jax):

    from fiery_tpu.utils.export_lib import load_exported
    fn, params = load_exported('model.fiery')
    outputs = fn(params, image, intrinsics, extrinsics, future_egomotion)

The artifact embeds the compile-time batch size and image geometry; exporting per
deployment shape is intended (static shapes are what make the TPU graph fast).
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--config', default='', type=str,
                        help='config YAML (default: baseline defaults)')
    parser.add_argument('--checkpoint', default='', type=str,
                        help='orbax checkpoint directory to embed; random init if empty')
    parser.add_argument('--output', required=True, type=str)
    parser.add_argument('--batch', default=1, type=int)
    parser.add_argument('--validate', action='store_true',
                        help='deserialize and compare against the live model')
    parser.add_argument('opts', nargs=argparse.REMAINDER, default=[],
                        help='config KEY VALUE overrides')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from fiery_tpu.utils.config import get_cfg
    from fiery_tpu.utils.export_lib import export_model, load_exported
    from fiery_tpu.data.synthetic import SyntheticFutureDataset

    cfg = get_cfg(argparse.Namespace(config_file=args.config, opts=args.opts))
    blob, variables, fn = export_model(cfg, checkpoint=args.checkpoint,
                                       batch=args.batch)
    with open(args.output, 'wb') as f:
        f.write(blob)
    print(f'wrote {args.output} ({len(blob) / 1e6:.1f} MB)')

    if args.validate:
        loaded_fn, params = load_exported(args.output)
        ds = SyntheticFutureDataset(cfg, n_samples=args.batch, n_instances=1, seed=0)
        b = ds.get_batch(list(range(args.batch)))
        inputs = tuple(jnp.asarray(b[k]) for k in
                       ['image', 'intrinsics', 'extrinsics', 'future_egomotion'])
        got = loaded_fn(params, *inputs)
        # compare compiled-vs-compiled: eager f32 accumulates in a different
        # order than the fused XLA executable (~1e-4 on deep conv chains)
        want = jax.jit(fn)(variables, *inputs)
        for k in want:
            if want[k] is None:
                continue
            np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                       atol=1e-5, err_msg=k)
        print('validate ok: exported artifact matches the live model')


if __name__ == '__main__':
    main()
