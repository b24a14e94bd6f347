"""Tests for the modeled-HBM-traffic HLO parser (utils/hlo_traffic.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from fiery_tpu.utils.hlo_traffic import (
    _split_instruction, modeled_traffic, shape_bytes)

_FAKE_HLO = """\
HloModule jit_f, entry_computation_layout={(f32[8,16]{1,0})->f32[8,16]{1,0}}

%fused_computation (param_0: f32[8,16]) -> f32[8,16] {
  %param_0 = f32[8,16]{1,0} parameter(0)
  ROOT %mul = f32[8,16]{1,0} multiply(f32[8,16]{1,0} %param_0, f32[8,16]{1,0} %param_0)
}

ENTRY %main.5 (Arg_0.1: f32[8,16]) {
  %Arg_0.1 = f32[8,16]{1,0} parameter(0)
  %constant.2 = f32[] constant(2)
  %fusion = f32[8,16]{1,0} fusion(f32[8,16]{1,0} %Arg_0.1), kind=kLoop, calls=%fused_computation
  %tup = (f32[8,16]{1,0}, f32[]) tuple(f32[8,16]{1,0} %fusion, f32[] %constant.2)
  %gte = f32[8,16]{1,0} get-tuple-element((f32[8,16]{1,0}, f32[]) %tup), index=0
  ROOT %copy.1 = f32[8,16]{1,0} copy(f32[8,16]{1,0} %gte)
}
"""


def test_shape_bytes():
    assert shape_bytes('f32[8,16]{1,0}') == 8 * 16 * 4
    assert shape_bytes('bf16[3,4] f32[2]') == 3 * 4 * 2 + 2 * 4
    assert shape_bytes('f32[]') == 4          # scalar: one element
    assert shape_bytes('u8[100]') == 100
    assert shape_bytes('nonsense[9]') == 0    # unknown dtype ignored


def test_split_instruction_tuple_output():
    out, opcode, operands = _split_instruction(
        '(bf16[2]{0}, f32[3]{0}) fusion(bf16[4]{0} %a, f32[] %b), kind=kLoop')
    assert shape_bytes(out) == 2 * 2 + 3 * 4
    assert opcode == 'fusion'
    assert shape_bytes(operands) == 4 * 2 + 4


def test_modeled_traffic_fake_hlo():
    # counted kernels: the fusion (in 512B + out 512B) and the copy (512+512);
    # parameter/constant/tuple/get-tuple-element are aliasing pseudo-ops
    info = modeled_traffic(_FAKE_HLO)
    assert info['n_kernels'] == 2
    assert info['n_while'] == 0
    assert info['bytes'] == 4 * (8 * 16 * 4)
    assert set(info['by_op']) == {'fusion', 'copy'}
    # the non-entry %fused_computation body must NOT be double-counted
    assert info['by_op']['fusion'] == 2 * (8 * 16 * 4)


def test_modeled_traffic_real_compiled_graph():
    # a real jit-compiled graph: traffic must be positive and within a sane
    # multiple of the theoretical minimum (one read of x + one write of out)
    def f(x):
        return jnp.tanh(x @ x.T).sum(axis=1)

    x = jnp.zeros((64, 128), jnp.float32)
    hlo = jax.jit(f).lower(x).compile().as_text()
    info = modeled_traffic(hlo)
    min_bytes = x.size * 4 + 64 * 4
    assert info['bytes'] >= min_bytes
    assert info['bytes'] <= 20 * min_bytes
    assert info['n_while'] == 0


def test_modeled_traffic_below_xla_bytes_accessed():
    # the whole point: on a multi-consumer graph the modeled figure must come
    # in at or below XLA's "bytes accessed" (which bills shared buffers per use)
    def f(x, w):
        h = x @ w
        return (jnp.maximum(h, 0) + jnp.tanh(h) + h * h).sum()

    x = jnp.zeros((32, 256), jnp.float32)
    w = jnp.zeros((256, 256), jnp.float32)
    compiled = jax.jit(f).lower(x, w).compile()
    info = modeled_traffic(compiled.as_text())
    cost = compiled.cost_analysis()
    xla_bytes = float(cost.get('bytes accessed', 0.0))
    if xla_bytes:
        assert info['bytes'] <= max(xla_bytes, 1.0) * 1.05
