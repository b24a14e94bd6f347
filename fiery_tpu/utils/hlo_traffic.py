"""Modeled HBM traffic from optimized HLO text (round-2 VERDICT weak #2 / next #4).

XLA's ``cost_analysis()['bytes accessed']`` overcounts real HBM traffic: a
buffer consumed by N fusions is billed N times inside each consumer *and* the
producer, and transcendental-heavy fusions get synthetic byte charges.  Measured
on this model the XLA figure is ~3x a hand traffic estimate, which made the
reported ``roofline_fraction`` (0.852 in BENCH_r02) an upper bound the repo's
own notes distrusted.

This module computes the *modeled* traffic instead: walk the ENTRY computation
of the optimized HLO (each top-level instruction is one fused kernel launch on
TPU) and charge, per instruction,

    bytes = sum(operand buffer sizes)  +  output buffer size

i.e. each buffer is read once per consuming kernel and written once by its
producer — exactly one HBM pass each way, the best any schedule can do without
inter-kernel fusion.  Aliasing pseudo-ops (``get-tuple-element``, ``tuple``,
``bitcast``, ``parameter``, ``constant``) move no data and are skipped; layout
``copy`` and host transfers are real traffic and are counted.

The model assumes no ``while``/``call`` at entry level (true for the fiery
train step — the only loops in the repo are in postprocessing); if loops are
present their bodies are charged once and ``n_while`` flags the undercount.

The result is a LOWER bound on real traffic (VMEM-resident reuse inside a
kernel can only help; partial-tile padding and re-reads hurt), so
``modeled_bytes / (time * 819e9)`` is an honest-to-pessimistic HBM utilisation,
reported in bench.py as ``hbm_util_modeled`` alongside the XLA figure.
"""

import re

DTYPE_BYTES = {'bf16': 2, 'f16': 2, 'f32': 4, 'f64': 8, 's32': 4, 'u32': 4,
               's16': 2, 'u16': 2, 's8': 1, 'u8': 1, 'pred': 1, 's64': 8,
               'u64': 8, 'c64': 8, 'c128': 16, 'f8e4m3fn': 1, 'f8e5m2': 1}

_SHAPE_RE = re.compile(r'\b(\w+)\[([\d,]*)\]')

# ops that alias or re-label an existing buffer: no HBM traffic of their own
_FREE_OPS = frozenset({
    'parameter', 'constant', 'get-tuple-element', 'tuple', 'bitcast',
    'after-all', 'add-dependency', 'partition-id', 'replica-id', 'domain',
    'opt-barrier',
})


def shape_bytes(text):
    """Sum byte sizes of every ``dtype[dims]`` occurrence in ``text``."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(text):
        if dtype not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(','):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dtype]
    return total


def _entry_lines(hlo_text):
    """Yield instruction lines of the ENTRY computation."""
    in_entry = False
    for line in hlo_text.splitlines():
        if line.startswith('ENTRY '):
            in_entry = True
            continue
        if in_entry:
            if line.startswith('}'):
                return
            stripped = line.strip()
            if stripped and '=' in stripped:
                yield stripped


_INSTR_RE = re.compile(r'^(?:ROOT )?%?[\w.\-]+\s*=\s*(.*)$')


def _split_instruction(rhs):
    """Split an instruction RHS into (output_shape_text, opcode, operand_text).

    ``rhs`` looks like ``bf16[1,2]{1,0} fusion(bf16[3]{0} %a, ...), kind=...``
    or, for multi-output ops, ``(bf16[2]{0}, f32[]) fusion(...)``.
    """
    rhs = rhs.strip()
    if rhs.startswith('('):
        # tuple-shaped output: find the matching close paren
        depth = 0
        for i, ch in enumerate(rhs):
            depth += ch == '('
            depth -= ch == ')'
            if depth == 0:
                break
        out_shape, rest = rhs[:i + 1], rhs[i + 1:].strip()
    else:
        parts = rhs.split(' ', 1)
        out_shape, rest = parts[0], parts[1] if len(parts) > 1 else ''
    m = re.match(r'([\w\-]+)\s*\(', rest)
    if not m:
        return out_shape, rest.split(' ')[0], ''
    opcode = m.group(1)
    # operand text: from the opcode's '(' to its matching ')'
    start = rest.index('(')
    depth = 0
    for i in range(start, len(rest)):
        depth += rest[i] == '('
        depth -= rest[i] == ')'
        if depth == 0:
            break
    return out_shape, opcode, rest[start + 1:i]


def modeled_traffic(hlo_text):
    """Modeled HBM bytes of the ENTRY computation (see module docstring).

    Returns a dict: ``bytes`` (total modeled traffic), ``n_kernels`` (counted
    instructions), ``n_while`` (loops whose bodies were charged only once —
    0 for the fiery train step), and ``by_op`` (bytes per opcode, descending).
    """
    total = 0
    n_kernels = 0
    n_while = 0
    by_op = {}
    for line in _entry_lines(hlo_text):
        m = _INSTR_RE.match(line)
        if not m:
            continue
        out_shape, opcode, operands = _split_instruction(m.group(1))
        if opcode in _FREE_OPS:
            continue
        if opcode in ('while', 'call', 'conditional'):
            n_while += 1
        nbytes = shape_bytes(out_shape) + shape_bytes(operands)
        total += nbytes
        n_kernels += 1
        by_op[opcode] = by_op.get(opcode, 0) + nbytes
    return {
        'bytes': total,
        'n_kernels': n_kernels,
        'n_while': n_while,
        'by_op': dict(sorted(by_op.items(), key=lambda kv: -kv[1])),
    }
