#!/usr/bin/env python3
"""Canary-normalized cross-round bench report (VERDICT r17 Next #1).

Per-round full per-query records live in the BENCH_LAST.json /
BENCH_QUIET.json blobs committed at each driver `round N:` commit (the
BENCH_r{N}.json harness artifacts keep only a ~4 KB stdout tail, which
front-clips a 200+-query record). This script walks those commits, picks
the cleanest record per round, and emits the table the judge asked for:
per round, the shared-query total vs the previous round, the canary floor,
and the canary-normalized ratio — plus the per-query movers that make a
swing like r17's x101 mechanical to adjudicate instead of archaeological.

Canary: a fixed-work synthetic query (no parquet, no repo operator) runs
at every pass boundary since r17. Its cross-round ratio measures the HOST,
so  normalized_ratio = (total_b / total_a) / (canary_b / canary_a)
reads as CODE. Rounds before r17 carry no canary -> raw ratio only.

Usage:
  python3 scripts/bench_report.py                 # cross-round table
  python3 scripts/bench_report.py --movers 16 17  # per-query movers r16->r17
  python3 scripts/bench_report.py --query x101_decon_fuzzy
  python3 scripts/bench_report.py --check   # CI: wt BENCH_QUIET vs newest round, exit 1 on regression
"""
import argparse
import json
import re
import subprocess
import sys

REPO = "/root/repo"


def git(*args):
    return subprocess.run(
        ["git", "-C", REPO] + list(args), capture_output=True, text=True
    ).stdout


def load_blob(commit, path):
    out = git("show", f"{commit}:{path}")
    if not out.strip():
        return None
    try:
        d = json.loads(out)
        return d if isinstance(d, dict) and d.get("queries") else None
    except json.JSONDecodeError:
        return None


def round_windows():
    """[(round_no, [commits oldest->newest in that round's window])].

    Round N's window = commits after the `round N-1:` driver close up to and
    including the `round N:` close — the builder's mid-round quiet artifacts
    live INSIDE the window (r16's committed quiet run reads 222.5 s while the
    round-close commit carries the contended 385.9 s driver run)."""
    lines = git("log", "--reverse", "--format=%h %s").splitlines()
    windows, cur_commits = [], []
    for line in lines:
        h, _, subject = line.partition(" ")
        cur_commits.append(h)
        m = re.match(r"^round (\d+): verdict", subject)
        if m:
            windows.append((int(m.group(1)), cur_commits))
            cur_commits = []
    if cur_commits and windows:
        windows.append((windows[-1][0] + 1, cur_commits))  # current round so far
    return windows


def pick_record(commits):
    """Quietest clean full record in a round window: among every
    BENCH_QUIET/BENCH_LAST version committed in the window, prefer complete
    (non-partial, no load warning) records with the most queries, then the
    lowest total — the builder's quiet-box run, not whichever run happened
    to be last."""
    touched = set()
    for path in ("BENCH_QUIET.json", "BENCH_LAST.json"):
        for c in commits:
            out = git("show", "--name-only", "--format=", c)
            if path in out.split():
                touched.add((c, path))
    candidates = []
    for c, path in touched:
        rec = load_blob(c, path)
        if rec:
            clean = not rec.get("partial") and not rec.get("load_warning")
            candidates.append(
                (clean, len(rec["queries"]), -sum(rec["queries"].values()),
                 rec, f"{path.split('_')[1][:5].rstrip('.json')}@{c}"))
    if not candidates:
        return None, None
    best = max(candidates, key=lambda t: t[:3])
    return best[3], best[4]


def summarize(rec):
    qs = rec["queries"]
    return {
        "queries": qs,
        "total": sum(qs.values()),
        "n": len(qs),
        "canary": rec.get("canary_sec"),
        "sf": rec.get("sf"),
        "partial": rec.get("partial"),
        "load_warning": rec.get("load_warning"),
    }


def collect():
    recs = {}
    for rnd, commits in round_windows():
        rec, src = pick_record(commits)
        if rec:
            recs[rnd] = (summarize(rec), src)
    return recs


def fmt(v, spec="{:.2f}"):
    return spec.format(v) if isinstance(v, (int, float)) else "-"


def table(recs):
    print(f"{'rnd':>3} {'src':<14} {'nq':>4} {'total_s':>8} {'canary':>7} "
          f"{'shared':>6} {'tot_a':>8} {'tot_b':>8} {'raw_x':>6} {'norm_x':>6} flags")
    prev = None
    for rnd in sorted(recs):
        cur, src = recs[rnd]
        shared = tot_a = tot_b = raw = norm = None
        if prev:
            prnd, (p, _) = prev
            shared_q = sorted(set(p["queries"]) & set(cur["queries"]))
            if shared_q:
                shared = len(shared_q)
                tot_a = sum(p["queries"][q] for q in shared_q)
                tot_b = sum(cur["queries"][q] for q in shared_q)
                raw = tot_b / tot_a
                if p["canary"] and cur["canary"]:
                    norm = raw / (cur["canary"] / p["canary"])
        flags = []
        if cur.get("partial"):
            flags.append("partial")
        if cur.get("load_warning"):
            flags.append("load!")
        print(f"{rnd:>3} {src:<14} {cur['n']:>4} {cur['total']:>8.1f} "
              f"{fmt(cur['canary'], '{:.3f}'):>7} {shared if shared else '-':>6} "
              f"{fmt(tot_a, '{:.1f}'):>8} {fmt(tot_b, '{:.1f}'):>8} "
              f"{fmt(raw):>6} {fmt(norm):>6} {','.join(flags)}")
        prev = (rnd, recs[rnd])


def mover_rows(pa, pb, threshold):
    can = None
    if pa["canary"] and pb["canary"]:
        can = pb["canary"] / pa["canary"]
    rows = []
    for q in sorted(set(pa["queries"]) & set(pb["queries"])):
        va, vb = pa["queries"][q], pb["queries"][q]
        if va <= 0:
            continue
        r = (vb / va) / (can or 1.0)
        if r >= threshold or r <= 1 / threshold:
            rows.append((r, q, va, vb))
    return can, rows


def movers(recs, a, b, threshold):
    (pa, sa), (pb, sb) = recs[a], recs[b]
    can, rows = mover_rows(pa, pb, threshold)
    print(f"movers r{a} ({sa}) -> r{b} ({sb}); canary ratio "
          f"{fmt(can)} (norm {'ON' if can else 'OFF — raw'})")
    for r, q, va, vb in sorted(rows, reverse=True):
        print(f"  {r:6.2f}x  {q:<28} {va:8.3f} -> {vb:8.3f}")
    if not rows:
        print(f"  none past {threshold}x (normalized)")


def check(recs, threshold):
    """CI mode: compare the working-tree BENCH_QUIET against the newest
    committed round record, canary-normalized; exit 1 on any shared query
    slower than `threshold`x. Makes the x101-style adjudication a script's
    job — a perf regression fails here, not in a judge's cross-round read."""
    with open(f"{REPO}/BENCH_QUIET.json") as fh:
        cur = summarize(json.load(fh))
    baseline_rnd = max(recs)
    base, src = recs[baseline_rnd]
    can, rows = mover_rows(base, cur, threshold)
    regressions = [r for r in sorted(rows, reverse=True) if r[0] >= threshold]
    print(f"check: BENCH_QUIET (wt, nq {cur['n']}, canary {fmt(cur['canary'], '{:.3f}')}) "
          f"vs r{baseline_rnd} ({src}); canary ratio {fmt(can)}; threshold {threshold}x")
    for r, q, va, vb in regressions:
        print(f"  REGRESSION {r:6.2f}x  {q:<28} {va:8.3f} -> {vb:8.3f}")
    if regressions:
        sys.exit(1)
    print("  no normalized regressions past threshold")


def query_history(recs, name):
    print(f"{'rnd':>3} {'src':<14} {'min_s':>8} {'canary':>7} {'q/canary':>8}")
    for rnd in sorted(recs):
        cur, src = recs[rnd]
        v = cur["queries"].get(name)
        if v is None:
            continue
        rel = v / cur["canary"] if cur["canary"] else None
        print(f"{rnd:>3} {src:<14} {v:>8.3f} {fmt(cur['canary'], '{:.3f}'):>7} "
              f"{fmt(rel):>8}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--movers", nargs=2, type=int, metavar=("A", "B"))
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--query")
    ap.add_argument("--check", action="store_true",
                    help="CI: working-tree BENCH_QUIET vs the newest round record; exit 1 on regression")
    ap.add_argument("--extra", nargs="*", default=[], metavar="LABEL=PATH",
                    help="include a working-tree record, e.g. wt=/root/repo/BENCH_QUIET.json")
    args = ap.parse_args()
    recs = collect()
    for spec in args.extra:
        label, path = spec.split("=", 1)
        with open(path) as fh:
            d = json.load(fh)
        if d.get("queries"):
            # extras sort after real rounds: label as round 1000+i
            recs[1000 + args.extra.index(spec)] = (summarize(d), label)
    if args.check:
        check(recs, args.threshold)
        return
    if args.movers:
        a, b = args.movers
        if a not in recs or b not in recs:
            sys.exit(f"no record for round {a if a not in recs else b}")
        movers(recs, a, b, args.threshold)
    elif args.query:
        query_history(recs, args.query)
    else:
        table(recs)


if __name__ == "__main__":
    main()
