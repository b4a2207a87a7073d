#!/usr/bin/env python3
"""Regenerate BASELINE.md's ONE authoritative per-key table (round 18).

Reads BENCH_FULL.json (the round's closing run) and the existing
BASELINE.md, then rewrites BASELINE.md so that:
  - exactly ONE pipe-parseable `q_x` | sec row exists per key (the
    consolidated table) — Bench's regex and the judge's >2x audit need
    no last-match disambiguation;
  - the trigger column is the element-wise MIN of the historical
    baseline and the closing run (local[32] wall is machine-noisy;
    minima are the stable signal — the file's own convention);
  - the closing run's wall AND task-cpu ride alongside, with the
    last-measured round;
  - every historical per-key pipe row is DE-PIPED into plain text
    (history kept, regex-invisible).

Usage: baseline_consolidate.py <BENCH_FULL.json> <BASELINE.md> <round>
"""
import json, re, sys

bench_path, baseline_path, rnd = sys.argv[1], sys.argv[2], sys.argv[3]
bench = json.load(open(bench_path))
# The table is denominated at the bench SF (sf0.1): consolidating a
# smoke run from a smaller decade would permanently LOWER the minima
# (sf0.001 walls undercut every sf0.1 floor) — refuse.
if not bench.get("sf", "").rstrip("/").endswith("sf0.1"):
    sys.exit(f"refusing to consolidate a non-sf0.1 run ({bench.get('sf')})")
wall = bench["queries"]
cpu = bench.get("queries_cpu", {})
retried = set(bench.get("retried", []))

# FLOOR CLAMP (round 19): floors below ~0.08 s wall are one lucky
# run's scheduling on a 32-thread local mode (cpu columns for such
# keys sit at 0.005-0.03 s — the wall is scheduler noise, not work).
# Un-clamped they generate retry churn (97 keys re-ran as "retried" in
# r18) and spurious raw >2x reads on sub-0.25 s keys. The trigger
# denominator never drops below this.
MIN_FLOOR = 0.08

txt = open(baseline_path, encoding="utf-8").read()

# Idempotence: a prior run's authoritative section is REPLACED, not
# stacked — its rows still feed the minima below (read before the
# strip), but only one section may claim to hold the parseable rows.
txt_rows_source = txt
m = re.search(r"\n## Authoritative per-key baseline \(round .*", txt, re.S)
if m:
    txt = txt[:m.start()]

# Historical per-key minima (the trigger denominators Bench parses
# today) — same regex as Bench.scala.
hist = {}
for m in re.finditer(r"`(q_\w+)`\s*\|\s*([0-9.]+)", txt_rows_source):
    k, v = m.group(1), float(m.group(2))
    hist[k] = min(hist.get(k, v), v)

# Historical per-key CPU minima (round 20, verdict ask 3): harvested
# from the prior authoritative table's cpu columns — both the per-round
# cpu and (once present) the running cpu-floor column — so cpu-drift
# adjudication has a mechanical all-time denominator instead of
# per-round ledger archaeology. Older de-piped narrative rows carry
# wall only; cpu floors accumulate from the r19 table onward.
MIN_CPU_FLOOR = 0.05
hist_cpu = {}
for m in re.finditer(
        r"\|\s*`(q_\w+)`\s*\|\s*[0-9.]+\s*\|\s*[0-9.]+\s*\|\s*([0-9.]+)"
        r"(?:\s*\|\s*([0-9.]+))?\s*\|\s*r\d+", txt_rows_source):
    k = m.group(1)
    for g in (m.group(2), m.group(3)):
        if g is None:
            continue
        v = float(g)
        if v > 0:
            hist_cpu[k] = min(hist_cpu.get(k, v), v)

# De-pipe every historical per-key row: `q_x` | 0.12 -> `q_x` 0.12 —
# text (and history) survive, the parser sees only the new table.
# [ \t]* only (never \s*): whitespace must not span the newline, or a
# row without a trailing pipe would consume the NEXT line's leading
# pipe and merge two rows. A consumed mid-row delimiter is restored so
# following columns stay aligned.
txt = re.sub(r"(`q_\w+`)[ \t]*\|[ \t]*([0-9.]+)[ \t]*(\||$)",
             lambda m: f"{m.group(1)} {m.group(2)}" +
                       (" |" if m.group(3) == "|" else ""),
             txt, flags=re.M)
# Markdown degradation in the history sections is acceptable — they
# are explicitly narrative after consolidation.

keys = sorted(wall.keys())
rows = []
for k in keys:
    w = wall[k]
    c = cpu.get(k, -1.0)
    trig = min(hist.get(k, w), w) if w > 0 else hist.get(k, 1.0)
    trig = max(trig, MIN_FLOOR)
    cfloor_candidates = [v for v in (hist_cpu.get(k), c if c > 0 else None)
                         if v is not None]
    cfloor = max(min(cfloor_candidates), MIN_CPU_FLOOR) \
        if cfloor_candidates else MIN_CPU_FLOOR
    notes = []
    if k in retried:
        notes.append("retried (scheduling-noise class)")
    rows.append(f"| `{k}` | {trig:.2f} | {w:.4f} | {c:.4f} | {cfloor:.2f} | "
                f"r{rnd} | {'; '.join(notes) if notes else '—'} |")

table = (
    f"\n## Authoritative per-key baseline (round {rnd}, sf0.1, local[32], "
    "warm warehouse)\n\n"
    "ONE row per key — the ONLY pipe-parseable `q_x` | sec rows in this\n"
    "file (historical tables below are de-piped narrative). Columns:\n"
    "**sec** = the retry/regression trigger denominator (element-wise\n"
    "min of all recorded rounds — local[32] wall is machine-noisy, so\n"
    "minima are the stable signal — CLAMPED to a 0.08 s floor: below\n"
    "that a recorded wall is one lucky run's scheduling, and unclamped\n"
    "it only generates retry churn). NOTE the denominator is therefore\n"
    "the all-time per-key FLOOR: any real run's wall sum lands ~1.1-1.3x\n"
    "this column's sum from scheduling noise alone — the regression gate\n"
    "is ZERO KEYS above 2x their row (host-factor-scaled), not the sum\n"
    "ratio. **wall/cpu rN** = the round-" + rnd +
    " closing\nrun (cpu is the host-phase-immune adjudication figure; "
    "compare cpu\nto cpu per the metric-time ledger convention). "
    "**cpu floor** = the\nall-time per-key task-cpu minimum (accumulated "
    "from the r19 table\nonward, clamped to 0.05 s) — the mechanical "
    "cpu-drift denominator:\nadjudicate a row (re-time on a clean phase, "
    "then profile or pin to a\nplan choice) when its round cpu exceeds "
    "max(3x floor, floor + 1 s);\nsame-code JIT/host-phase swings up to "
    "~3x on sub-second rows are the\ndocumented noise band (SCALE.md). "
    "Store-fed keys' cost moved to\ntheir named artifact-build rows in "
    "BENCH_FULL's ledger.\n\n"
    "| query | sec | wall r" + rnd + " | cpu r" + rnd +
    " | cpu floor | round | note |\n"
    "|---|---|---|---|---|---|---|\n" + "\n".join(rows) + "\n")

txt += table
open(baseline_path, "w", encoding="utf-8").write(txt)
print(f"consolidated {len(rows)} keys; historical rows de-piped")
