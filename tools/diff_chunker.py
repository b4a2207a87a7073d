#!/usr/bin/env python3
"""Differential test: graft.functions.Chunker vs the reference's own
chunk_reply (/root/reference/telegram-agent.py), on adversarial inputs.

Usage: python3 tools/diff_chunker.py   (expects sbt on PATH, run from repo root)
"""
import base64, random, re, subprocess, sys, tempfile, os

# Extract ONLY the chunking section from the reference (its module imports
# network deps we don't want); behavior, not code, is what we compare.
src = open("/root/reference/telegram-agent.py").read()
m = re.search(r"_TG_MAX_CHARS = .*?(?=\n# ---)", src, re.S)
ns = {}
exec(m.group(0), ns)
chunk_reply = ns["chunk_reply"]

random.seed(int(__import__("os").environ.get("SEED", "42")))
words = ["alpha", "beta", "gamma.", "x", "longword" * 60, "mid sentence. here"]
seps = [" ", " ", ". ", "\n\n", "\n\n\n", "  "]
cases = []
for n in (0, 1, 5, 50, 300, 900, 2000):
    for _ in range(6):
        k = random.randrange(max(n, 1))
        cases.append("".join(random.choice(words) + random.choice(seps)
                             for _ in range(n)))
cases += ["", "short", "x" * 4096, "x" * 4097, "a" * 10000,
          ("para " * 400 + "\n\n") * 4, ("sentence. " * 500)]
# Astral-plane (non-BMP) inputs: Python len() counts code points, JVM
# String.length counts UTF-16 units — these cases force the divergence
# (each emoji is 2 UTF-16 units) at every boundary: the outer limit
# check, paragraph/sentence budgets, and the hard mid-sentence split.
astral = "\U0001F600\U0001F680\U0001F9E0"  # 3 code points, 6 UTF-16 units
cases += [astral * 1365 + "x",             # 4096 cps — exactly at the limit
          astral * 1366,                   # 4098 cps — just over
          (astral * 680 + ". ") * 4,      # sentence packing with emoji
          (astral * 1500 + "\n\n") * 3,   # paragraph > budget, hard split
          "a" * 4087 + astral,             # boundary straddles the budget
          ("\U0001F600 word. " * 700)]

with tempfile.TemporaryDirectory() as td:
    inp, outp = os.path.join(td, "in.txt"), os.path.join(td, "out.txt")
    with open(inp, "w") as f:
        for c in cases:
            f.write(base64.b64encode(c.encode()).decode() + "\n")
    subprocess.run(["sbt", "-batch", f"runMain graft.tools.ChunkDump {inp} {outp}"],
                   check=True, capture_output=True, text=True)
    scala_out = open(outp).read().split("\n")

fails = 0
for i, c in enumerate(cases):
    expected = chunk_reply(c)
    got = ([base64.b64decode(x).decode() for x in scala_out[i].split("\t")]
           if scala_out[i] else ([""] if expected == [""] else []))
    if got != expected:
        fails += 1
        print(f"CASE {i} MISMATCH (len={len(c)}):")
        print("  expected:", [e[:60] for e in expected][:4], f"({len(expected)} chunks)")
        print("  got:     ", [g[:60] for g in got][:4], f"({len(got)} chunks)")
print(f"{len(cases)} cases, {fails} mismatches")
sys.exit(1 if fails else 0)
