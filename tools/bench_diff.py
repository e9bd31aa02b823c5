#!/usr/bin/env python3
"""Diff two bench artifacts (bench_last.json / bench_history.jsonl entries)
per query, contended-aware (round-13 verdict task 4).

Rows listed in the NEWER artifact's `contended_rows` timed under
replay-tier thread contention, so their per-row values are only
comparable to other contended runs: they are excluded from the per-row
regression flags and summarized through `replay_wall_sec` instead.
Artifacts predating the tag (no `contended_rows` field) get the r12
heuristic: st_stream_/dd_stream_ rows are treated as contended when the
artifact records replay_concurrency > 1.

Usage:
  tools/bench_diff.py OLD.json NEW.json [--threshold 1.5]
  tools/bench_diff.py --history bench_history.jsonl   # last two entries

Exit 1 when any non-contended row regresses past the threshold AND both
runs are canary-quiet (a loaded window is environment, not plan — the
canary gate's whole point).
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[-1])


def contended_rows(art):
    if "contended_rows" in art:
        return set(art["contended_rows"])
    if art.get("replay_concurrency", 1) > 1:  # pre-tag artifact heuristic
        return {k for k in art.get("queries", {})
                if k.startswith("st_stream_") or k.startswith("dd_stream_")}
    return set()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old", nargs="?")
    ap.add_argument("new", nargs="?")
    ap.add_argument("--history", help="take the last two entries of a jsonl")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()

    if args.history:
        with open(args.history) as f:
            entries = [json.loads(l) for l in f if l.strip()]
        if len(entries) < 2:
            sys.exit("history has fewer than two entries")
        old, new = entries[-2], entries[-1]
    else:
        if not (args.old and args.new):
            sys.exit("need OLD and NEW artifacts (or --history)")
        old, new = load(args.old), load(args.new)

    qo, qn = old.get("queries", {}), new.get("queries", {})
    cont = contended_rows(new) | contended_rows(old)
    both_quiet = (old.get("record_quality") == "quiet"
                  and new.get("record_quality") == "quiet")
    # two quiet-gated runs can still sit at different host-noise levels
    # (r12's final re-run: canary 0.115 -> 0.162, median row ratio 1.21,
    # zero real regressions) — normalize per-row ratios by the canary
    # ratio so a global noise shift doesn't flag every row
    ca, cb = old.get("canary_mean", -1), new.get("canary_mean", -1)
    noise = cb / ca if (ca and cb and ca > 0 and cb > 0) else 1.0
    noise = max(noise, 1.0)  # only ever EXCUSE slowdowns, never speedups

    shared = sorted(set(qo) & set(qn))
    regressions = []
    print(f"{'row':34s} {'old':>8s} {'new':>8s} {'ratio':>6s}")
    for k in shared:
        a, b = qo[k], qn[k]
        ratio = b / a if a > 0 else float("inf")
        tag = " [contended]" if k in cont else ""
        flag = ""
        if k not in cont and ratio >= args.threshold * noise and b >= 0.5:
            flag = " <-- regression" if both_quiet else " (loaded window?)"
            if both_quiet:
                regressions.append((k, a, b, ratio))
        if flag or tag or ratio >= args.threshold or ratio <= 1 / args.threshold:
            print(f"{k:34s} {a:8.3f} {b:8.3f} {ratio:6.2f}{tag}{flag}")
    if noise > 1.0:
        print(f"-- canary noise ratio {noise:.2f}: per-row flag threshold "
              f"scaled to {args.threshold * noise:.2f}x")

    for field in ("ops_sec", "replay_wall_sec", "value"):
        a, b = old.get(field), new.get(field)
        if a and b:
            print(f"-- {field}: {a:.1f} -> {b:.1f} ({b / a:.2f}x)")
    print(f"-- canary: {old.get('canary_mean')} -> {new.get('canary_mean')}"
          f" | quality: {old.get('record_quality')} -> {new.get('record_quality')}")
    print(f"-- contended rows excluded from per-row flags: {len(cont)}")

    if regressions:
        print(f"\n{len(regressions)} per-row regression(s) past "
              f"{args.threshold}x on quiet runs", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
