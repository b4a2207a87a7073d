#!/usr/bin/env python3
"""Differential test: graft.functions.TokenUsage vs the reference's
extract_token_usage (jq pipeline) on random JSON documents.

Usage: python3 tools/diff_tokens.py   (sbt + jq on PATH, run from repo root)
"""
import base64, json, os, random, subprocess, sys, tempfile

random.seed(int(__import__("os").environ.get("SEED", "3")))
def gen_doc():
    d = {}
    if random.random() < 0.9:
        u = {}
        for f in ("input_tokens", "cache_creation_input_tokens",
                  "cache_read_input_tokens", "output_tokens"):
            if random.random() < 0.8:
                u[f] = random.randrange(0, 1 << 20)
        d["usage"] = u
    if random.random() < 0.8:
        mu = {}
        for m in range(random.randrange(0, 3)):
            entry = {}
            if random.random() < 0.8:
                entry["contextWindow"] = random.choice([1000, 200000, 1 << 20])
            entry["inputTokens"] = random.randrange(0, 999)
            mu[f"model-{m}"] = entry
        d["modelUsage"] = mu
    if random.random() < 0.3:
        d["result"] = "ok"
    return d

cases = [gen_doc() for _ in range(150)] + [{}, {"usage": {}}, {"modelUsage": {}}]

def bash_ref(doc):
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(doc, f); path = f.name
    script = f'''
      source <(sed -n '/^extract_token_usage()/,/^}}/p' /root/reference/agent-loop.sh)
      extract_token_usage "{path}"
    '''
    out = subprocess.run(["bash", "-c", script], capture_output=True, text=True)
    os.unlink(path)
    return out.stdout.strip()

with tempfile.TemporaryDirectory() as td:
    inp, outp = os.path.join(td, "in.txt"), os.path.join(td, "out.txt")
    with open(inp, "w") as f:
        for c in cases:
            f.write(base64.b64encode(json.dumps(c).encode()).decode() + "\n")
    subprocess.run(["sbt", "-batch", f"runMain graft.tools.TokenDump {inp} {outp}"],
                   check=True, capture_output=True, text=True)
    lines = open(outp).read().split("\n")

fails = 0
for i, c in enumerate(cases):
    ref = bash_ref(c)
    if lines[i] != ref:
        fails += 1
        print(f"CASE {i} {json.dumps(c)[:120]}: ref={ref!r} got={lines[i]!r}")
print(f"{len(cases)} cases, {fails} mismatches")
sys.exit(1 if fails else 0)
