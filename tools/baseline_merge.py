#!/usr/bin/env python3
"""Regenerate BENCH_BASELINE_quiet.json from N quiet bench captures.

Usage: baseline_merge.py <out.json> <capture1.json> [capture2.json ...]

Per-query (and per-artifact) baseline = MEDIAN across the quiet captures —
the round-8 verdict showed an element-wise MIN is biased low per query, so
even a 0.79%-steal run flags 17 sub-3.3s queries at 1.5-1.8x and re-runs
~95. The headline total keeps the MIN across captures (the best honest
suite wall-clock). Captures with steal_pct >= 2 are rejected — a polluted
capture folded into the baseline poisons every future adjudication.

Each capture is a graft.Bench full-output JSON (BENCH_full.json). Failed
queries (value < 0) in any capture are excluded from that capture's vote.
"""
import sys, json, statistics

def main():
    out, paths = sys.argv[1], sys.argv[2:]
    caps = []
    for p in paths:
        d = json.load(open(p))
        steal = d.get("steal", {}).get("steal_pct", 0.0)
        if steal >= 2.0:
            print(f"REJECT {p}: steal_pct {steal:.2f} >= 2 (not a quiet window)")
            continue
        caps.append((p, d))
    if not caps:
        sys.exit("no quiet captures — baseline unchanged")
    votes = {}
    for _, d in caps:
        for section in ("queries", "artifacts"):
            for k, v in d.get(section, {}).items():
                if v >= 0:
                    votes.setdefault((section, k), []).append(v)
    base = json.loads(json.dumps(caps[0][1]))  # deep copy of first capture's shape
    base["queries"] = {k: statistics.median(v) for (s, k), v in sorted(votes.items()) if s == "queries"}
    base["artifacts"] = {k: statistics.median(v) for (s, k), v in sorted(votes.items()) if s == "artifacts"}
    base["artifact_total"] = sum(base["artifacts"].values())
    base["value"] = min(d["value"] for _, d in caps)
    # a query that failed in EVERY quiet capture has no vote at all — it
    # would otherwise vanish from "queries" silently and drop out of all
    # future adjudication (ADVICE r9); name it loudly instead
    all_failed = set.intersection(*(set(d.get("failed", [])) for _, d in caps)) \
        if caps else set()
    for q in sorted(all_failed):
        print(f"WARNING: {q} failed in every quiet capture — it has NO baseline "
              f"entry and will be excluded from regression adjudication until it "
              f"succeeds in a future refresh")
    base["steal"] = max((d.get("steal", {}) for _, d in caps),
                        key=lambda s: s.get("steal_pct", 0.0))
    base["baseline"] = None
    base["failed"] = sorted(set(f for _, d in caps for f in d.get("failed", [])))
    base["refresh_note"] = {
        "refreshed": f"median of {len(caps)} quiet captures per query; min total "
                     f"(round-9 policy: median kills the min-merge low bias that "
                     f"chronically flagged sub-second queries). NB mixed "
                     f"statistics: 'value' is the MIN suite total while "
                     f"per-query entries are MEDIANS, so value != sum(queries) "
                     f"+ sum(artifacts) by design — do not sanity-check totals "
                     f"against the per-query sum",
        "captures": [p for p, _ in caps],
    }
    json.dump(base, open(out, "w"), indent=1)
    print(f"wrote {out}: {len(base['queries'])} queries, total {base['value']:.1f}s, "
          f"max steal {base['steal'].get('steal_pct', 0):.2f}%")

if __name__ == "__main__":
    main()
