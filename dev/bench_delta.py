#!/usr/bin/env python3
"""Cross-round bench regression gate (dev tool): diff two BENCH artifacts'
anchor-normalized per-query series and separate signal from noise — a
delta only counts as a regression when it exceeds the query's own
measured rep spread (plus a floor), otherwise it's ambient load (the r16
driver-vs-self normalized totals disagreed 1.7x on identical code).

Usage: python3 dev/bench_delta.py BENCH_r16.json BENCH_r17.json [out.json]

Writes a JSON artifact (default BENCH_DELTA.json next to the newer file)
with per-query norm ratios, spread context, and a `regressions` list,
and prints the top movers.
"""
import sys, json, os

FLOOR = 0.15  # ignore <15% moves outright: below rep-to-rep noise floor


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old_p, new_p = sys.argv[1], sys.argv[2]
    out_p = sys.argv[3] if len(sys.argv) > 3 else \
        os.path.join(os.path.dirname(os.path.abspath(new_p)), "BENCH_DELTA.json")
    def load(p):
        d = json.load(open(p))
        # accept the driver wrapper ({"parsed": {...bench line...}}) as
        # well as the raw Bench stdout JSON
        return d.get("parsed") if isinstance(d.get("parsed"), dict) else d
    old, new = load(old_p), load(new_p)
    on, nn = old.get("queries_norm"), new.get("queries_norm")
    if not on or not nn:
        sys.exit("both artifacts need queries_norm (anchored full-suite runs)")
    spread = new.get("queries_spread", {})
    shared = [q for q in sorted(set(on) & set(nn)) if on[q] > 0]
    raw = {q: nn[q] / on[q] for q in shared}
    # median-center: when the WHOLE suite moved together, that's anchor
    # miscalibration / ambient load, not code (two same-code r16
    # self-runs showed a uniform 10-15% shift that classified 98 queries
    # as "improved"). A code change moves ITS queries against the
    # suite's median, which is what the centered ratio isolates.
    srt = sorted(raw.values())
    med = srt[len(srt) // 2] if srt else 1.0
    rows = []
    for q in shared:
        ratio = raw[q] / med if med > 0 else raw[q]
        sp = spread.get(q)
        # the query's own rep spread is the noise bar; when this run
        # didn't stamp one (older artifact), fall back to the floor
        bar = max(FLOOR, sp if sp is not None else FLOOR)
        verdict = ("regression" if ratio - 1 > bar else
                   "improvement" if 1 - ratio > bar else "noise")
        rows.append({"query": q, "old_norm": on[q], "new_norm": nn[q],
                     "ratio": round(ratio, 3), "raw_ratio": round(raw[q], 3),
                     "spread": sp, "verdict": verdict})
    rows.sort(key=lambda r: -r["ratio"])
    regs = [r for r in rows if r["verdict"] == "regression"]
    imps = [r for r in rows if r["verdict"] == "improvement"]
    art = {"old": os.path.basename(old_p), "new": os.path.basename(new_p),
           "old_commit": old.get("commit"), "new_commit": new.get("commit"),
           "anchor_old": old.get("anchor_min"), "anchor_new": new.get("anchor_min"),
           "median_raw_ratio": round(med, 3),
           "n_compared": len(rows), "n_regressions": len(regs),
           "n_improvements": len(imps), "rows": rows,
           "regressions": [r["query"] for r in regs]}
    json.dump(art, open(out_p, "w"), indent=1)
    print(f"compared {len(rows)} queries "
          f"({old.get('commit')} -> {new.get('commit')}); "
          f"{len(regs)} regressions, {len(imps)} improvements -> {out_p}")
    for r in rows[:10]:
        sp = "n/a" if r["spread"] is None else f"{r['spread']:.2f}"
        print(f"  {r['query']:<28} {r['old_norm']:>8.2f} -> {r['new_norm']:>8.2f} "
              f"x{r['ratio']:<6} spread={sp:<5} {r['verdict']}")


if __name__ == "__main__":
    main()
