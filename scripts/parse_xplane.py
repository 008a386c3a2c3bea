"""Parse a jax.profiler xplane.pb device trace — no tensorflow needed.

Minimal protobuf wire-format walker over the stable XSpace/XPlane/XLine/
XEvent schema (tsl/profiler/protobuf/xplane.proto), used because the
installed tensorboard-plugin-profile ships no xplane_pb2.  XEvent
durations are picoseconds per the schema (validated: the outer jit
program's summed duration matches wall-clock timing of the traced
forwards).

    python run_script.py parse_xplane /tmp/mfu_trace [--forwards 5]

Prints per-category device busy time per forward — the measurement behind
the MFU table in docs/architecture.md.
"""

import argparse
import collections
import json
from pathlib import Path


def read_varint(buf, i):
    shift = v = 0
    while True:
        b = buf[i]; i += 1
        v |= (b & 0x7F) << shift
        if not (b & 0x80):
            return v, i
        shift += 7


def parse_msg(buf):
    out = collections.defaultdict(list)
    i, n = 0, len(buf)
    while i < n:
        key, i = read_varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:
            v, i = read_varint(buf, i)
        elif wt == 2:
            ln, i = read_varint(buf, i)
            v = buf[i:i + ln]; i += ln
        elif wt == 5:
            v = int.from_bytes(buf[i:i + 4], "little"); i += 4
        elif wt == 1:
            v = int.from_bytes(buf[i:i + 8], "little"); i += 8
        else:
            raise ValueError(f"wire type {wt}")
        out[field].append(v)
    return out


#: substring → category, first match wins; tuned for the int8 encoder
CATEGORIES = [
    ("ffn_block_int8", "ffn_int8_kernel"),
    ("quant_matmul_int8", "qkv_int8_kernel"),
    ("oneshot_attention", "attention_kernel"),
    ("attention_from_qkv", "attention_kernel"),
    ("attn_ffn_block_int8", "ffn_int8_kernel"),
    ("flash", "attention_kernel"),
    ("convolution", "xla_matmul"),
    ("dot", "xla_matmul"),
    ("copy-start", "async_copy"),
    ("copy-done", "async_copy"),
    ("copy", "layout_copy"),
    ("abs_reduce", "xla_fusion"),
    ("transpose", "layout_copy"),
    ("fusion", "xla_fusion"),
    ("while", "OUTER"),
    ("jit_", "OUTER"),
    ("infeed", "infeed"),
    ("dynamic-update-slice", "xla_fusion"),
]


def categorize(name):
    for sub, cat in CATEGORIES:
        if sub in name:
            return cat
    return "other"


def device_events(path, line_name="XLA Ops"):
    """Yield (op_name, duration_ps) from ONE XLine of the TPU device plane.

    A device plane carries several overlapping lines ("XLA Modules" = whole
    program spans, "XLA Ops" = per-op spans nested under them, "Async XLA
    Ops" = async copy spans) — summing across lines double-counts, so the
    caller picks one.  Within "XLA Ops", control-flow region ops (`while`,
    `conditional`) span their children; categorize() maps them to OUTER so
    they can be excluded from busy-time sums.
    """
    space = parse_msg(Path(path).read_bytes())
    for plane_buf in space[1]:
        plane = parse_msg(plane_buf)
        name = plane[2][0].decode() if plane.get(2) else "?"
        if "/device:TPU" not in name:
            continue
        ev_names = {}
        for entry in plane.get(4, []):
            e = parse_msg(entry)
            k = e[1][0] if e.get(1) else 0
            md = parse_msg(e[2][0]) if e.get(2) else {}
            ev_names[k] = md[2][0].decode() if md.get(2) else "?"
        for line_buf in plane.get(3, []):
            line = parse_msg(line_buf)
            lname = line[2][0].decode() if line.get(2) else "?"
            if lname != line_name:
                continue
            for ev_buf in line.get(4, []):
                ev = parse_msg(ev_buf)
                mid = ev[1][0] if ev.get(1) else 0
                dur = ev[3][0] if ev.get(3) else 0
                yield ev_names.get(mid, "?"), dur


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--forwards", type=int, default=5,
                    help="number of traced forward passes (for per-forward "
                         "normalization)")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    pbs = sorted(Path(args.trace_dir).rglob("*.xplane.pb"))
    if not pbs:
        raise SystemExit(f"no .xplane.pb under {args.trace_dir}")
    per_op = collections.Counter()
    per_cat = collections.Counter()
    for name, dur_ps in device_events(pbs[-1], "XLA Ops"):
        per_op[name] += dur_ps
        per_cat[categorize(name)] += dur_ps
    module_ps = sum(d for _, d in device_events(pbs[-1], "XLA Modules"))

    per_cat.pop("OUTER", 0)  # control-flow spans cover their children
    n = args.forwards
    outer_ms = module_ps / 1e9
    print(f"device program (XLA Modules): {outer_ms / n:.3f} ms/forward "
          f"({outer_ms:.1f} ms / {n})")
    print("\nper-category device time, ms/forward:")
    rows = {}
    for cat, ns in per_cat.most_common():
        rows[cat] = round(ns / 1e9 / n, 3)
        print(f"  {ns / 1e9 / n:8.3f}  {cat}")
    print("\ntop ops, ms/forward:")
    for name, ns in per_op.most_common(args.top):
        if categorize(name) == "OUTER":
            continue
        print(f"  {ns / 1e9 / n:8.3f}  {name[:110]}")
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(
            {"outer_ms_per_forward": round(outer_ms / n, 3),
             "per_category_ms_per_forward": rows}, indent=2))


if __name__ == "__main__":
    main()
