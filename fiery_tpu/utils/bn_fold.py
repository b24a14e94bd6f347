"""Eval-graph BatchNorm folding: absorb BN affines into the preceding convs.

The serving/eval graph (reference evaluate.py runs the training graph in eval
mode, as did ours) performs, for every BatchNorm, a separate
``(x - mean) * scale * rsqrt(var + eps) + bias`` pass with *runtime* coefficient
vectors — an extra HBM round trip per BN that XLA cannot remove because the
coefficients are parameters. At eval this is foldable exactly:

    BN(conv(x)) = conv'(x) + add,   conv' = conv with kernel * mul,
    mul = scale * rsqrt(var + eps),  add = bias - mean * mul

``fold_batchnorm`` rewrites every conv kernel whose output feeds a BatchNorm
(they are direct siblings in every module of this model — ConvBlock, Bottleneck,
MBConv, CausalConv3d, UpsamplingAdd/Concat, decoder blocks) and resets that BN
to a pure ``+ add``:  scale'=1, mean'=0, var'=1-eps  (so rsqrt(var'+eps)=1).

``make_serving_fn`` then closes over the BN parameters and batch_stats as jit
CONSTANTS: with literal 1/0/(1-eps) coefficients XLA's algebraic simplifier
reduces the whole BN to a constant bias-add fused into the conv epilogue, and
the separate normalize pass disappears from the serving graph. Only non-BN
params remain runtime arguments, so weight updates don't recompile.

Per-BN epsilons (1e-3 in the EfficientNet backbone, 1e-5 elsewhere) are read
from ``EPS_REGISTRY``, populated at trace time by models/layers._BNCore; the
registry is filled with a free ``jax.eval_shape`` pass.
"""

import jax
import jax.numpy as jnp
import numpy as np

# scope path (tuple ending in ('BatchNorm_0', 'BatchNorm_0')) -> module epsilon;
# written by _BNCore.__call__ at trace time
EPS_REGISTRY = {}


def _is_conv_node(v):
    return isinstance(v, dict) and 'kernel' in v and getattr(
        v['kernel'], 'ndim', 0) >= 2


def _is_bn_node(v):
    return (isinstance(v, dict) and 'BatchNorm_0' in v
            and isinstance(v['BatchNorm_0'], dict) and 'scale' in v['BatchNorm_0'])


def populate_eps_registry(model, variables, example_inputs):
    """Fill EPS_REGISTRY for this model via a compute-free abstract trace."""
    abstract = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), jnp.asarray(a).dtype
                                       if not hasattr(a, 'dtype') else a.dtype),
        tuple(example_inputs))
    jax.eval_shape(
        lambda v, inp: model.apply(v, *inp, train=False), variables, abstract)


def fold_batchnorm(variables, strict=True):
    """Return variables with every conv->BN pair folded (exact at eval).

    variables: {'params': ..., 'batch_stats': ...}. EPS_REGISTRY must cover the
    model's BNs (call populate_eps_registry first, or any prior apply/init).
    strict=True raises if a BatchNorm cannot be paired with a preceding sibling
    conv of matching width (every BN in this model can be).
    """
    params = jax.tree.map(np.asarray, jax.device_get(variables['params']))
    stats = jax.tree.map(np.asarray, jax.device_get(variables['batch_stats']))
    n_folded = 0
    unpaired = []

    def _suffix(key):
        base, _, num = key.rpartition('_')
        # at equal numeric suffix, plain Conv_N precedes ConvTranspose_N: the 1x1
        # down-projection is always declared before the transposed conv in this
        # codebase (Bottleneck upsample), and ASCII would order them the other way
        return (int(num) if num.isdigit() else -1, base == 'ConvTranspose', key)

    def walk(p_node, s_node, path):
        """Pair each BatchNorm with its producing sibling conv.

        Robust to dict-key reordering (checkpoint round trips may sort keys):
        BNs are processed in numeric-suffix order; each takes the unpaired
        conv-like sibling of matching output width with the smallest suffix,
        preferring bias-free convs (every BN-feeding conv in this model is
        bias-free; bias convs like squeeze-excite never feed a BN directly).
        The folded-vs-unfolded exactness test is the real guarantee.
        """
        nonlocal n_folded
        convs = sorted(([k, v, False] for k, v in p_node.items()
                        if _is_conv_node(v)), key=lambda c: _suffix(c[0]))
        bns = sorted((k for k, v in p_node.items() if _is_bn_node(v)),
                     key=_suffix)
        for key in bns:
            bn = p_node[key]['BatchNorm_0']
            st = s_node[key]['BatchNorm_0']
            C = bn['scale'].shape[0]
            eps = EPS_REGISTRY.get(path + (key, 'BatchNorm_0'))
            cands = [c for c in convs
                     if not c[2] and c[1]['kernel'].shape[-1] == C]
            biasfree = [c for c in cands if 'bias' not in c[1]]
            target = (biasfree or cands or [None])[0]
            if target is None or eps is None:
                unpaired.append('/'.join(path + (key,))
                                + ('' if eps is not None else ' [no eps]'))
                continue
            target[2] = True
            mul = bn['scale'] * 1.0 / np.sqrt(st['var'] + eps)
            add = bn['bias'] - st['mean'] * mul
            target[1]['kernel'] = (target[1]['kernel'] * mul).astype(
                target[1]['kernel'].dtype)
            if 'bias' in target[1]:
                # BN(conv(x)+b) = conv'(x) + (b*mul) + add; keep b folded too
                target[1]['bias'] = (target[1]['bias'] * mul).astype(
                    target[1]['bias'].dtype)
            bn['scale'] = np.ones((C,), np.float32)
            bn['bias'] = add.astype(np.float32)
            st['mean'] = np.zeros((C,), np.float32)
            st['var'] = np.full((C,), 1.0 - eps, np.float32)
            n_folded += 1
        for key, val in p_node.items():
            if isinstance(val, dict) and not _is_bn_node(val):
                walk(val, s_node.get(key, {}) if isinstance(s_node, dict) else {},
                     path + (key,))

    walk(params, stats, ())
    if unpaired and strict:
        raise ValueError(f'Unfoldable BatchNorms: {unpaired}')
    out = dict(variables)
    out['params'] = params
    out['batch_stats'] = stats
    return out, n_folded


def _split_bn_constants(variables):
    """Partition: BN scale/bias params + ALL batch_stats become constants."""

    def split_params(node, path):
        args, consts = {}, {}
        for key, val in node.items():
            if _is_bn_node(val):
                inner = val['BatchNorm_0']
                consts[key] = {'BatchNorm_0': inner}
                rest = {k: v for k, v in val.items() if k != 'BatchNorm_0'}
                if rest:
                    a, c = split_params(rest, path + (key,))
                    if a:
                        args[key] = a
                    for ck, cv in c.items():
                        consts[key][ck] = cv
            elif isinstance(val, dict):
                a, c = split_params(val, path + (key,))
                if a:
                    args[key] = a
                if c:
                    consts[key] = c
            else:
                args[key] = val
        return args, consts

    args, consts = split_params(variables['params'], ())
    return args, {'params_bn': consts, 'batch_stats': variables['batch_stats']}


def _merge_params(args, consts):
    if not isinstance(args, dict):
        return args
    out = dict(args)
    for key, val in consts.items():
        if key in out:
            out[key] = _merge_params(out[key], val)
        else:
            out[key] = val
    return out


def make_serving_fn(model, variables, example_inputs, fold=True):
    """(fn, arg_params): eval forward with BN folded away at compile time.

    fn(arg_params, *inputs) runs model.apply(train=False) with BN affines and
    running stats baked as jit constants (identity after folding -> the BN ops
    vanish in XLA's simplifier). arg_params holds every other weight, so new
    checkpoints re-use the compiled executable.
    """
    populate_eps_registry(model, variables, example_inputs)
    if fold:
        variables, _ = fold_batchnorm(variables)
    arg_params, consts = _split_bn_constants(variables)
    extra = {k: v for k, v in variables.items()
             if k not in ('params', 'batch_stats')}

    def fn(arg_params, *inputs):
        v = dict(extra)
        v['params'] = _merge_params(arg_params, consts['params_bn'])
        v['batch_stats'] = consts['batch_stats']
        return model.apply(v, *inputs, train=False)

    return fn, arg_params
