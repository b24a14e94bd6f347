"""Per-fusion attribution of the train-step trace (VERDICT r1 #3).

Joins the XPlane op durations with the optimized HLO dumped by profile_step.py
(/tmp/trace_r2/hlo.txt): every fusion gets its output/operand byte estimate and
its jax source scope (metadata op_name), so the formerly bucket-level "rest" can
be read per fusion — est ms/step (share of the measured 488 ms step), implied
HBM bandwidth (bytes / est time; the chip peak is 819 GB/s — a big fusion far
below peak is a layout/padding victim, a fusion at peak is done), and the model
stage it belongs to.

Usage: python tools/fusion_attr.py [trace_dir] [step_ms]
"""
import collections
import os
import re
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fiery_tpu.utils.profiling import summarise_trace

DTYPE_BYTES = {'bf16': 2, 'f16': 2, 'f32': 4, 'f64': 8, 's32': 4, 'u32': 4,
               's16': 2, 'u16': 2, 's8': 1, 'u8': 1, 'pred': 1, 's64': 8,
               'u64': 8, 'c64': 8}

_SHAPE_RE = re.compile(r'(\w+)\[([\d,]*)\]')


def shape_bytes(text):
    """Sum byte sizes of every dtype[shape] occurrence in ``text``."""
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


def load_hlo_defs(path):
    """(op_name -> def_line, computation_name -> representative op_name scope)."""
    defs = {}
    comp_scope = {}
    current_comp = None
    with open(path) as f:
        for line in f:
            stripped = line.strip()
            m = re.match(r'%?([\w.\-]+) \(.*\) -> ', stripped)
            if m and not line.startswith('  '):
                current_comp = m.group(1)
                continue
            m = re.match(r'(?:ROOT )?%?([\w.\-]+) = ', stripped)
            if m:
                defs.setdefault(m.group(1), stripped)
                if current_comp and current_comp not in comp_scope:
                    s = re.search(r'op_name="([^"]*)"', stripped)
                    if s:
                        comp_scope[current_comp] = s.group(1)
    return defs, comp_scope


def scope_of(line, comp_scope):
    m = re.search(r'op_name="([^"]*)"', line)
    if m:
        return m.group(1)
    m = re.search(r'calls=%?([\w.\-]+)', line)
    if m:
        return comp_scope.get(m.group(1), '')
    return ''


STAGES = [
    ('splat/segment-sum', ['segment_sum', 'lift_splat', 'sorted_splat']),
    ('encoder', ['encoder', 'efficientnet', 'MBConv', 'bev_lift']),
    ('temporal', ['temporal_model', 'TemporalBlock', 'CausalConv', 'Conv1x1x1']),
    ('future/GRU', ['future_prediction', 'SpatialGRU', 'conv_gates',
                    'state_tilde']),
    ('decoder', ['decoder', 'BasicBlock', 'UpsamplingAdd', 'heads']),
    ('distributions', ['distribution']),
    ('warps', ['warp', 'grid_sample']),
    ('losses', ['loss', 'segmentation_loss', 'top_k', 'kth']),
    ('optimizer', ['adam', 'scale_by', 'clip_by', 'add_decayed']),
    ('labels', ['prepare_future_labels', 'label']),
]


def stage_of(scope):
    s = scope.lower()
    for name, keys in STAGES:
        if any(k.lower() in s for k in keys):
            return name
    return 'other'


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/trace_r2'
    step_ms = float(sys.argv[2]) if len(sys.argv) > 2 else 488.0
    ranked, _ = summarise_trace(trace_dir, top=100000)
    defs, comp_scope = load_hlo_defs(os.path.join(trace_dir, 'hlo.txt'))

    # drop the module/step envelope lines and async windows (prefetch overlap)
    ops = []
    for name, us in ranked:
        if name.startswith('jit_') or re.fullmatch(r'\d+', name):
            continue
        if any(tag in name for tag in
               ('copy-start', 'copy-done', 'slice-start', 'slice-done',
                'async-start', 'async-done')):
            continue
        ops.append((name, us))
    total_us = sum(us for _, us in ops)

    per_stage = collections.defaultdict(float)
    rows = []
    for name, us in ops:
        # trace event names may embed the whole def text ("fusion.17 = bf16[...")
        key = name.lstrip('%').split(' = ')[0].split(' ')[0]
        line = defs.get(key, '') or name
        scope = scope_of(line, comp_scope)
        stage = stage_of(scope or name)
        share = us / total_us
        est_ms = share * step_ms
        nbytes = shape_bytes(line.split(' = ', 1)[-1]) if line else 0
        bw = (nbytes / 3 / (est_ms / 1e3) / 1e9) if est_ms > 0 else 0  # 3 steps
        per_stage[stage] += est_ms
        rows.append((est_ms, bw, nbytes / 3 / 1e6, stage, scope[:90] or name[:90],
                     key))

    print(f'== per-stage (est ms of the {step_ms:.0f} ms step)')
    for stage, ms in sorted(per_stage.items(), key=lambda kv: -kv[1]):
        print(f'{ms:8.1f} ms  {100 * ms / step_ms:5.1f}%  {stage}')

    print('\n== top fusions (est ms/step, implied GB/s vs 819 peak, MB touched)')
    rows.sort(key=lambda r: -r[0])
    for est_ms, bw, mb, stage, scope, key in rows[:45]:
        print(f'{est_ms:7.2f} ms {bw:7.0f} GB/s {mb:8.1f} MB  [{stage:>16}] '
              f'{key[:28]:28} {scope}')


if __name__ == '__main__':
    main()
