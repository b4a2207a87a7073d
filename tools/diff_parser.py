#!/usr/bin/env python3
"""Differential test: graft.sources.TaskListParser vs the reference's own
bash parse_tasks (/root/reference/agent-loop.sh), on random task files.

Usage: python3 tools/diff_parser.py   (sbt on PATH, run from repo root)
"""
import os, random, subprocess, sys, tempfile

random.seed(int(__import__("os").environ.get("SEED", "7")))
LINES = [
    "## Alpha", "## Beta Group", "##NoSpace", "## ",
    "- task one", "- another task", "-nospace", "- ",
    "  continuation words", "   more detail", " x", "\tindented tab",
    "", "   ", "plain text line",
    "## CRLF group\r", "- crlf task\r", "  crlf cont\r",
]
def gen_file():
    return "\n".join(random.choice(LINES) for _ in range(random.randrange(0, 30)))

def bash_parse(path):
    script = f'''
      set -u
      source <(sed -n '/^flush_task()/,/^}}/p' /root/reference/agent-loop.sh)
      source <(sed -n '/^parse_tasks()/,/^}}/p' /root/reference/agent-loop.sh)
      TASK_GROUPS=(); TASK_TEXTS=(); TOTAL_TASKS=0
      parse_tasks "{path}"
      for i in $(seq 0 $((TOTAL_TASKS - 1))); do
        printf '%s\\x01%s\\x01%s\\n' "$((i + 1))" "${{TASK_GROUPS[$i]}}" "${{TASK_TEXTS[$i]}}"
      done
    '''
    out = subprocess.run(["bash", "-c", script], capture_output=True, text=True)
    if out.returncode != 0:
        print("bash parser failed:", out.stderr[:500]); sys.exit(2)
    return [tuple(l.split("\x01")) for l in out.stdout.split("\n") if l]

with tempfile.TemporaryDirectory() as td:
    expected = {}
    for i in range(40):
        name = f"f{i:03d}.md"
        body = gen_file()
        with open(os.path.join(td, name), "w", newline="") as f:
            f.write(body)
        expected[name] = bash_parse(os.path.join(td, name))
    outp = os.path.join(td, "scala.txt")
    subprocess.run(["sbt", "-batch", f"runMain graft.tools.ParseDump {td} {outp}"],
                   check=True, capture_output=True, text=True)
    got = {}
    content = open(outp).read()
    for line in content.split("\n"):
        if not line: continue
        fname, idx, grp, task = line.split("\x01")
        got.setdefault(fname, []).append((idx, grp, task))

fails = 0
for name, exp in sorted(expected.items()):
    g = sorted(got.get(name, []), key=lambda t: int(t[0]))
    if g != exp:
        fails += 1
        print(f"{name} MISMATCH:\n  bash : {exp}\n  spark: {g}")
print(f"40 files, {fails} mismatches")
sys.exit(1 if fails else 0)
