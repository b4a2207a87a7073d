#!/usr/bin/env python3
"""Differential test: Scalars.slug / Scalars.classify vs the reference's
bash slugify / classify_error on adversarial inputs.

Usage: python3 tools/diff_scalars.py   (sbt on PATH, run from repo root)
"""
import base64, os, random, subprocess, sys, tempfile

random.seed(int(__import__("os").environ.get("SEED", "11")))
frag = ["Hello World", "foo---bar", "  spaces  ", "UPPER", "under_score",
        "num42", "!!!", "---", "a", "", "mixed-UP_case 9",
        "429", "error 429 here", "rate_limit hit", "Too Many Requests",
        "context_length exceeded", "token limit reached", "maximum context",
        "401", "authentication failed", "Invalid API Key provided",
        "timeout", "SIGTERM", "timed out", "deadline exceeded",
        "ECONNREFUSED", "DNS failure", "network down", "connection refused",
        "benign text", "x429y", "rate limiter", "sigterm lower"]
cases = ["".join(random.choice(frag) + random.choice([" ", ", ", "\t", ""])
                 for _ in range(random.randrange(0, 6)))
         for _ in range(120)] + frag

def bash_ref(text):
    with tempfile.NamedTemporaryFile("w", suffix=".log", delete=False) as f:
        f.write(text); log = f.name
    script = f'''
      source <(sed -n '/^slugify()/,/^}}/p' /root/reference/agent-loop.sh)
      source <(sed -n '/^classify_error()/,/^}}/p' /root/reference/agent-loop.sh)
      s=$(slugify "$(cat {log})" | cut -c1-30)
      c=$(classify_error "{log}")
      printf '%s\\x01%s' "$s" "$c"
    '''
    out = subprocess.run(["bash", "-c", script], capture_output=True, text=True)
    os.unlink(log)
    return tuple(out.stdout.split("\x01"))

with tempfile.TemporaryDirectory() as td:
    inp, outp = os.path.join(td, "in.txt"), os.path.join(td, "out.txt")
    with open(inp, "w") as f:
        for c in cases:
            f.write(base64.b64encode(c.encode()).decode() + "\n")
    subprocess.run(["sbt", "-batch", f"runMain graft.tools.ScalarDump {inp} {outp}"],
                   check=True, capture_output=True, text=True)
    lines = open(outp).read().split("\n")

fails = 0
for i, c in enumerate(cases):
    ref_slug, ref_cls = bash_ref(c)
    got_slug_b64, got_cls = lines[i].split("\t")
    got_slug = base64.b64decode(got_slug_b64).decode()
    if got_slug != ref_slug or got_cls != ref_cls:
        fails += 1
        print(f"CASE {i} {c!r}: slug {ref_slug!r} vs {got_slug!r}; cls {ref_cls} vs {got_cls}")
print(f"{len(cases)} cases, {fails} mismatches")
sys.exit(1 if fails else 0)
