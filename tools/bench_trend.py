#!/usr/bin/env python3
"""Per-query trend report over docs/bench_history.jsonl.

Compares the latest CLEAN run (contaminated==false when the field
exists; lines predating the flag are treated as clean only if their
loadavg_start is < cpus/8) against the minimum over all prior clean
runs — the min is the honest per-query baseline because host noise
only ever inflates a timing, never deflates it.

Usage: python3 tools/bench_trend.py [--factor 1.5] [--min-sec 2.0]
Exit code 1 when regressions are found (CI-able).
"""
import argparse
import json
import sys


def is_clean(line):
    if "contaminated" in line:
        return not line["contaminated"]
    cpus = float(line.get("cpus") or 4)
    start = line.get("loadavg_start")
    if start is None:
        return True  # predates instrumentation; keep but it's weaker
    return start <= max(1.0, cpus / 8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--history", default="docs/bench_history.jsonl")
    ap.add_argument("--factor", type=float, default=1.5,
                    help="flag when latest > baseline * factor")
    ap.add_argument("--min-sec", type=float, default=2.0,
                    help="ignore queries whose latest time is below this")
    args = ap.parse_args()

    lines = [json.loads(l) for l in open(args.history)]
    clean = [l for l in lines if is_clean(l)]
    if len(clean) < 2:
        print("need >= 2 clean runs for a trend")
        return 0
    latest, prior = clean[-1], clean[:-1]
    baseline = {}
    for run in prior:
        for q, t in run.get("queries", {}).items():
            if q not in baseline or t < baseline[q]:
                baseline[q] = t

    regs, news = [], []
    for q, t in sorted(latest["queries"].items()):
        if q not in baseline:
            news.append((q, t))
        elif t > baseline[q] * args.factor and t > args.min_sec:
            regs.append((q, baseline[q], t))

    raw = latest.get("raw_total_s")
    raw_note = f" raw(single-shot)={raw:.1f}s" if raw is not None else ""
    print(f"latest clean run: ts_ms={latest.get('ts_ms')} "
          f"batch={latest.get('batch_total_s', 0):.1f}s "
          f"stream={latest.get('streaming_total_s', 0):.1f}s{raw_note} "
          f"({len(prior)} prior clean runs as baseline)")
    if raw is not None:
        # pre-r11 history lines are single-shot; raw_total_s is the
        # like-with-like figure for cross-round total comparisons
        pr = [p.get("raw_total_s", p.get("value")) for p in prior]
        pr = [v for v in pr if v is not None]
        if pr:
            print(f"  raw-total vs best prior: {raw:.1f}s vs {min(pr):.1f}s")
    if news:
        print(f"\nnew queries ({len(news)}):")
        for q, t in news:
            print(f"  {t:7.2f}s  {q}")
    if regs:
        print(f"\nREGRESSIONS (> {args.factor}x best clean, > {args.min_sec}s):")
        for q, b, t in sorted(regs, key=lambda r: -r[2]):
            print(f"  {t:7.2f}s  (best {b:6.2f}s, {t/b:4.1f}x)  {q}")
        return 1
    print("\nno regressions above threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
