"""Minimal XPlane trace parsing: summarise op durations from a jax.profiler trace.

The tensorboard profile plugin in this image is ABI-broken against the installed TF,
so this decodes the .xplane.pb protobuf wire format directly (schema:
tensorflow/tsl/profiler/protobuf/xplane.proto) and aggregates per-op durations on the
TPU op planes. Use:

    jax.profiler.start_trace(dir); ...; jax.profiler.stop_trace()
    python -m fiery_tpu.utils.profiling <dir>
"""

import collections
import glob
import struct
import sys


def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf):
    """Yield (field_number, wire_type, value) over a protobuf message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val = buf[pos:pos + 8]
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f'unsupported wire type {wire}')
        yield field, wire, val


def _zigzag(v):
    return (v >> 1) ^ -(v & 1)


def parse_xplane(path):
    """Returns {plane_name: {op_name: total_duration_us}}."""
    with open(path, 'rb') as f:
        space = f.read()

    planes_out = {}
    for field, wire, val in _iter_fields(space):        # XSpace
        if field != 1:                                  # planes
            continue
        plane_name = ''
        metadata = {}
        lines = []
        for f2, w2, v2 in _iter_fields(val):            # XPlane
            if f2 == 2 and w2 == 2:                     # name
                plane_name = v2.decode('utf-8', 'replace')
            elif f2 == 3 and w2 == 2:                   # lines
                lines.append(v2)
            elif f2 == 4 and w2 == 2:                   # event_metadata map entry
                key = None
                name = None
                for f3, w3, v3 in _iter_fields(v2):
                    if f3 == 1 and w3 == 0:
                        key = v3
                    elif f3 == 2 and w3 == 2:           # XEventMetadata
                        for f4, w4, v4 in _iter_fields(v3):
                            if f4 == 2 and w4 == 2:     # name
                                name = v4.decode('utf-8', 'replace')
                if key is not None and name is not None:
                    metadata[key] = name

        durations = collections.defaultdict(float)
        for line in lines:
            for f3, w3, v3 in _iter_fields(line):       # XLine
                if f3 == 4 and w3 == 2:                 # events
                    md_id = None
                    dur_ps = 0
                    for f4, w4, v4 in _iter_fields(v3):  # XEvent
                        if f4 == 1 and w4 == 0:
                            md_id = v4
                        elif f4 == 3 and w4 == 0:        # duration_ps
                            dur_ps = v4
                    if md_id is not None:
                        durations[metadata.get(md_id, f'id{md_id}')] += dur_ps / 1e6
        if durations:
            planes_out[plane_name] = dict(durations)
    return planes_out


def summarise_trace(trace_dir, top=30, plane_filter='TPU'):
    """Aggregate op durations (us) across all xplane files under trace_dir."""
    files = glob.glob(f'{trace_dir}/**/*.xplane.pb', recursive=True)
    total = collections.defaultdict(float)
    planes_seen = []
    for path in files:
        for plane, ops in parse_xplane(path).items():
            planes_seen.append(plane)
            if plane_filter and plane_filter.lower() not in plane.lower():
                continue
            for name, us in ops.items():
                total[name] += us
    ranked = sorted(total.items(), key=lambda kv: -kv[1])
    return ranked[:top], planes_seen


def main():
    trace_dir = sys.argv[1]
    plane_filter = sys.argv[2] if len(sys.argv) > 2 else 'TPU'
    ranked, planes = summarise_trace(trace_dir, plane_filter=plane_filter)
    if not ranked:
        print('No ops found. Planes in trace:', sorted(set(planes)))
        return
    total = sum(us for _, us in ranked)
    print(f'{"us":>12}  {"%":>5}  op')
    for name, us in ranked:
        print(f'{us:12.0f}  {100 * us / total:5.1f}  {name[:140]}')


if __name__ == '__main__':
    main()
