"""Render README's measured-performance rows from a BENCH artifact.

Round-4 verdict (weak #5): three vintages of the same numbers were in the
tree (README ~8,200 preds/s, ROADMAP 11,229, BENCH_r04 10,831.7) and a
reader could not tell which was the system of record.  The fix is
structural: the bench artifact IS the record, and the README rows between
``<!-- bench:begin -->`` / ``<!-- bench:end -->`` are GENERATED from it by
this script.  ``--check`` exits nonzero when the README disagrees with the
artifact (run in CI / before recording a round).

Usage:
    python scripts/render_perf_docs.py --bench BENCH_r04.json [--check]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BEGIN, END = "<!-- bench:begin -->", "<!-- bench:end -->"


def rows_from_bench(bench: dict, source: str) -> str:
    v = bench["value"]
    vs = bench["vs_baseline"]
    srv = bench.get("serving_77c", {})
    sat = srv.get("saturated", {})
    ol = srv.get("open_loop", srv.get("open_loop_80pct", {}))
    big = bench.get("large_index_16384c", {})
    lines = [
        f"| Predictions/sec/chip **incl. host tokenization** "
        f"(`predict_batch`, unique queries) | **{v:,.0f}** | "
        f"**{vs:.1f}×** the reference's ONNX CPU path "
        f"(2.1 ms/query incl. tokenization) |",
    ]
    if sat:
        lines.append(
            f"| Serving capacity (batching server, 77 classes, saturated) | "
            f"{sat['qps']:,.0f} q/s at mean batch {sat['mean_batch_size']:.0f}"
            f" | — |")
    if "sustainable_qps" in ol and ol.get("sustainable_qps"):
        lines.append(
            f"| Serving open-loop SLO (highest stable offered rate) | "
            f"{ol['sustainable_qps']:,.0f} q/s with p50 {ol['p50_ms']} ms / "
            f"p99 {ol['p99_ms']} ms (SLO 100 ms) | reference latency bar: "
            f"< 2 s/prediction (integration CI) |")
    if big:
        lines.append(
            f"| 16,384-class index through the same public path | "
            f"{big['end_to_end_qps']:,.0f} q/s end-to-end (fused two-stage "
            f"top-k active: {big.get('fused_topk_active')}) | — |")
    lines.append(f"<!-- generated from {source} by "
                 f"scripts/render_perf_docs.py — edit the artifact, "
                 f"not these rows -->")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default=None,
                    help="BENCH json (default: newest BENCH_r*.json)")
    ap.add_argument("--check", action="store_true",
                    help="verify README matches; exit 1 on drift")
    args = ap.parse_args()

    if args.bench is None:
        benches = sorted(REPO.glob("BENCH_r*.json"))
        if not benches:
            raise SystemExit("no BENCH_r*.json artifact found")
        args.bench = str(benches[-1])
    bench = json.loads(Path(args.bench).read_text())
    if "value" not in bench and "tail" in bench:
        # driver-recorded BENCH_rN.json wraps bench.py's JSON line in "tail"
        line = next(l for l in reversed(bench["tail"].splitlines())
                    if l.startswith("{"))
        bench = json.loads(line)
    block = f"{BEGIN}\n{rows_from_bench(bench, Path(args.bench).name)}\n{END}"

    readme = REPO / "README.md"
    text = readme.read_text()
    if BEGIN not in text or END not in text:
        raise SystemExit(f"README.md lacks {BEGIN}/{END} markers")
    new = re.sub(re.escape(BEGIN) + r".*?" + re.escape(END), block, text,
                 flags=re.DOTALL)
    if args.check:
        if new != text:
            print("README.md bench rows are stale vs", args.bench)
            sys.exit(1)
        print("README.md bench rows match", args.bench)
        return
    readme.write_text(new)
    print(f"README.md bench rows rendered from {args.bench}")


if __name__ == "__main__":
    main()
