#!/usr/bin/env python3
"""Assemble a multi-executor correctness artifact from ClusterCheck runs.

Usage: check_cluster.py <out.json> <protocol-string> <base.json> \
           <other1.json> [<other2.json> ...]

Each input is a `graft.ClusterCheck` output (master/barrier/kill
settings + per-query {rows, hash, wall_sec, executors_removed,
tasks_failed, err}). The FIRST input is the reference execution
(normally local[32] on the same data); every other run's per-query
content hash must equal the reference's. For kill-mode runs
(kill_delay_sec != "off") the verdict additionally records whether the
kill actually landed mid-query (executors_removed >= 1) — a kill that
fired after completion proves nothing, but it is not an error either
(the query simply outran the delay), so it is reported as
`kill_landed: false` rather than failing the gate. BUT a kill-mode
run in which NO query saw a removal never exercised the kill at all —
that run is flagged (`kill_exercised: false`) and fails the gate,
because an artifact must not certify "kill survival" from a run where
the kill never fired.

Exit code 0 iff every run covers EXACTLY the reference's query set and
every query in every run has err == "" and a hash identical to the
reference. A query missing from a run is a MISMATCH, not a skip — a
partially-written run must never certify queries it never executed.
The artifact embeds all runs verbatim so the gate is re-derivable from
the file alone.
"""
import json
import sys


def main(out_path, protocol, base_path, other_paths):
    base = json.load(open(base_path))
    others = [json.load(open(p)) for p in other_paths]
    bq = base["queries"]
    verdict = {}
    all_ok = True
    # a run claiming queries the base never ran is equally unverifiable
    extra = {p: sorted(set(r["queries"]) - set(bq))
             for p, r in zip(other_paths, others)}
    for p, names in extra.items():
        if names:
            print(f"EXTRA queries in {p} absent from base "
                  f"(uncomparable): {names[:5]}...")
            all_ok = False
    for name, b in sorted(bq.items()):
        row = {"base_hash": b["hash"], "base_rows": b["rows"],
               "ok": b["err"] == ""}
        if b["err"]:
            row["base_err"] = b["err"][:200]
        for i, run in enumerate(others, 1):
            # run index in the label: two runs with identical
            # master/kill/barrier settings (e.g. repeated kill runs)
            # must not overwrite each other's columns.
            label = f"run{i}:" + run["master"] + (
                "+kill" if run["kill_delay_sec"] != "off" else "") + (
                "+" + run["barrier"] if run["barrier"] else "")
            q = run["queries"].get(name)
            if q is None:
                row[f"{label}:hash_match"] = False
                row[f"{label}:err"] = "query missing from this run"
                row["ok"] = False
                continue
            match = q["err"] == "" and q["hash"] == b["hash"]
            row[f"{label}:hash_match"] = match
            if q["err"]:
                row[f"{label}:err"] = q["err"][:200]
            if run["kill_delay_sec"] != "off":
                row[f"{label}:kill_landed"] = int(q["executors_removed"]) >= 1
                row[f"{label}:tasks_failed"] = int(q["tasks_failed"])
            row["ok"] = row["ok"] and match
        verdict[name] = row
        all_ok = all_ok and row["ok"]
    n_bad = sum(1 for v in verdict.values() if not v["ok"])
    # Aggregate kill gate: a kill-mode run where EVERY query outran the
    # delay (executors_removed == 0 across the board) never exercised
    # the kill — per-query kill_landed stays advisory, but the run as a
    # whole must have landed at least one removal or the gate fails.
    kill_exercised = {}
    for i, run in enumerate(others, 1):
        if run["kill_delay_sec"] != "off":
            landed = any(int(q.get("executors_removed", 0)) >= 1
                         for q in run["queries"].values())
            kill_exercised[f"run{i}"] = landed
            if not landed:
                print(f"KILL NOT EXERCISED: run{i} ({run['master']}) is "
                      "kill-mode but zero queries saw an executor removal")
                all_ok = False
    out = {"protocol": protocol,
           "n_queries": len(verdict), "n_mismatch": n_bad,
           "kill_exercised": kill_exercised,
           "runs": {"base": base,
                    **{f"run{i}": r for i, r in enumerate(others, 1)}},
           "verdict": verdict, "all_ok": all_ok}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"== {len(verdict) - n_bad}/{len(verdict)} hash-identical, "
          f"all_ok={all_ok} -> {out_path}")
    if not all_ok:
        for name, v in verdict.items():
            if not v["ok"]:
                print(f"MISMATCH {name}: {json.dumps(v)[:300]}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4:]))
