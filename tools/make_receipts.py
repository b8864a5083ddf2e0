#!/usr/bin/env python3
"""Generate the receipts gate block FROM measurement artifacts, not prose.

VERDICT r8 item 4: RECEIPTS_r08 said 800/800 while HEAD ran 816/816 —
the number was stamped from an earlier run and drifted as specs were
added. This script derives every count from the artifacts of an actual
run at the CURRENT commit and refuses to emit a block when a gate
failed, so the receipt numbers cannot disagree with a judge re-run
unless the tree changed after stamping (the emitted HEAD sha makes
that visible).

Usage:
  tools/make_receipts.py <sbt_test_log> <oracle_check_log> [bench_json]

  sbt_test_log     output of `sbt -batch test`
  oracle_check_log output of `tools/check_oracle.py <sf> <verifyDir>`
  bench_json       optional BENCH_full JSON to summarize

Prints a markdown gate block on stdout; paste (or redirect) into
RECEIPTS_r<N>.md. Exits nonzero if any parsed gate is red.
"""
import json
import re
import subprocess
import sys


def sh(cmd):
    return subprocess.check_output(cmd, shell=True, text=True).strip()


def main():
    test_log, oracle_log = sys.argv[1], sys.argv[2]
    bench_json = sys.argv[3] if len(sys.argv) > 3 else None

    head = sh("git rev-parse HEAD")
    dirty = sh("git status --porcelain -- src build.sbt")
    log = open(test_log, errors="replace").read()
    m = re.search(
        r"Tests: succeeded (\d+), failed (\d+), canceled (\d+), "
        r"ignored (\d+), pending (\d+)", log)
    if not m:
        sys.exit(f"no sbt test summary found in {test_log}")
    ok, failed, canceled, ignored, pending = map(int, m.groups())
    all_passed = "All tests passed." in log
    if failed or not all_passed:
        sys.exit(f"test gate RED: succeeded={ok} failed={failed} "
                 f"all_passed={all_passed} — refusing to stamp a receipt")

    olog = open(oracle_log, errors="replace").read()
    # check_oracle.py appends optional ", N exempt" / ", N timeout"
    # tails whenever ORACLE_EXEMPT or ORACLE_TIMEOUT_SEC produced
    # entries (ADVICE r9: the old regex rejected exactly those runs).
    om = re.search(r"== (\d+) pass, (\d+) fail, (\d+) skip"
                   r"(?:, (\d+) exempt)?(?:, (\d+) timeout)? ==", olog)
    if not om:
        sys.exit(f"no oracle summary found in {oracle_log}")
    opass, ofail, oskip = map(int, om.groups()[:3])
    oexempt = int(om.group(4) or 0)
    otimeout = int(om.group(5) or 0)
    # Stamping policy (explicit): fail/skip/timeout refuse — those
    # queries were never verified at this run. Operator-documented
    # exemptions ALLOW stamping, but the emitted block names each one
    # with its recorded reason so the receipt cannot silently launder
    # an exemption into a pass.
    if ofail or oskip or otimeout:
        sys.exit(f"oracle gate RED: {opass} pass {ofail} fail {oskip} skip"
                 f" {otimeout} timeout — refusing to stamp")
    exempt_lines = re.findall(r"^EXEMPT (\S+): (.*)$", olog, re.M)
    if len(exempt_lines) != oexempt:
        sys.exit(f"oracle log inconsistent: summary says {oexempt} exempt"
                 f" but {len(exempt_lines)} EXEMPT lines found")

    lines = [
        f"Gates measured at `{head}`"
        + (" (WARNING: src tree dirty at stamp time)" if dirty else "")
        + ", numbers machine-derived by `tools/make_receipts.py` from the"
        " run artifacts (not typed):",
        "",
        f"- Full ScalaTest + ScalaCheck suite: **{ok}/{ok} green**"
        f" (`sbt test`: succeeded {ok}, failed {failed}, canceled"
        f" {canceled}, ignored {ignored}, pending {pending};"
        f" \"All tests passed.\").",
        f"- DuckDB-oracle compare: **{opass} pass, {ofail} fail,"
        f" {oskip} skip"
        + (f", {oexempt} exempt" if oexempt else "")
        + "** (`tools/check_oracle.py`)."
        + ("".join(f"\n  - EXEMPT `{q}`: {why}" for q, why in exempt_lines)
           if exempt_lines else ""),
    ]
    if bench_json:
        b = json.load(open(bench_json))
        qs = b["queries"]
        succ = {k: v for k, v in qs.items() if v >= 0}
        n_err = len(qs) - len(succ)
        sub1 = sum(1 for v in succ.values() if v < 1.0)
        worst = max(succ.values()) if succ else float("nan")
        lines.append(
            f"- `{bench_json}`: {len(qs)} queries, {n_err} errored,"
            f" min-sum {b['value']:.1f} s, {100.0 * sub1 / len(qs):.1f}%"
            f" sub-second, worst {worst:.2f} s (sf={b.get('sf', '?')}).")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
