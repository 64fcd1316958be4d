#!/usr/bin/env python3
"""Refresh LEAKCHECK.json: grep src/main, src/test, and tools for
internal-looking identifiers (company names, private URLs/buckets,
chat links, key material, internal env vars). Mirrors the driver's
categories; hits list file:line:match truncated to keep the artifact
reviewable.

Usage: python3 tools/leakcheck.py <round>
"""
import json, os, re, sys

PATTERNS = {
    "internal-import": r"(?i)import\s+(anthropic|claude)",
    "internal-url": r"(?i)https?://[a-z0-9.-]*(anthropic|claude|corp[.-]internal)[a-z0-9.-]*",
    "internal-pkg2": r"(?i)\b(anthropic|claude[-_]?code)\b",
    "internal-bucket": r"(?i)(s3|gs)://[a-z0-9._-]*(anthropic|claude|internal|corp|prod-us|stg-us)[a-z0-9._-]*",
    "slack-link": r"(?i)(slack\.com/archives|#[a-z0-9-]*claude[a-z0-9-]*)",
    "api-key": r"(sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16})",
    "axon-env": r"(?i)\b(AXON|ANTHROPIC)_[A-Z0-9_]+\b",
}

ROOTS = ["src/main", "src/test", "tools"]


def main(rnd):
    base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hits = {k: [] for k in PATTERNS}
    for root in ROOTS:
        for dirpath, _, files in os.walk(os.path.join(base, root)):
            for f in files:
                if not f.endswith((".scala", ".py", ".md", ".json", ".sbt")):
                    continue
                if f == "leakcheck.py":  # the patterns themselves
                    continue
                p = os.path.join(dirpath, f)
                try:
                    lines = open(p, errors="replace").read().splitlines()
                except OSError:
                    continue
                rel = os.path.relpath(p, base)
                for i, line in enumerate(lines, 1):
                    for cat, pat in PATTERNS.items():
                        m = re.search(pat, line)
                        if m:
                            hits[cat].append(f"{rel}:{i}:{m.group(0)[:60]}")
    out = {"round": int(rnd),
           "n_hits": sum(len(v) for v in hits.values()),
           "hits": hits}
    json.dump(out, open(os.path.join(base, "LEAKCHECK.json"), "w"), indent=2)
    print(f"n_hits={out['n_hits']}")
    for cat, v in hits.items():
        for h in v:
            print(f"  {cat}: {h}")
    # a CI wiring must be able to FAIL on a leak (mirrors
    # correctness_json.py's nonzero-on-failure contract)
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
