"""Assemble CORRECTNESS_SELF_<round>.json from check_correctness logs.

Usage: python tools/build_correctness_self.py <out.json> <sf:logfile> [...]
Each log is the stdout of tools/check_correctness.py (PASS/FAIL lines).
"""

from __future__ import annotations

import json
import re
import subprocess
import sys

LINE = re.compile(
    r"^(PASS|FAIL) (\S+): (?:(\d+) rows\s*)?(?:\(([\d.]+)s\))?(.*)$")


def parse(path: str) -> dict:
    queries: dict[str, dict] = {}
    n_pass = n_fail = 0
    for raw in open(path):
        m = LINE.match(raw.strip())
        if not m:
            continue
        status, name, rows, sec, rest = m.groups()
        queries[name] = {
            "status": status,
            **({"rows": int(rows)} if rows else {}),
            **({"sec": float(sec)} if sec else {}),
            **({"detail": rest.strip()} if status == "FAIL" else {}),
        }
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
    return {"n_pass": n_pass, "n_fail": n_fail, "queries": queries}


def main() -> None:
    out_path = sys.argv[1]
    head = subprocess.run(["git", "rev-parse", "HEAD"],
                          capture_output=True, text=True).stdout.strip()
    doc = {
        "round": 14,
        "phase": "optimization-2-continuation",
        "git_head": head,
        "tool": ("tools/check_correctness.py (rows+schema+values vs DuckDB "
                 "oracle, driver-mimic)"),
        "note": ("full 66-query self-runs at the continuation's final HEAD "
                 "(window-df jaccard guard, chunk-generator fix, int "
                 "route-code carry, regexp_count class counts, q61 "
                 "fused-negative revert)"),
    }
    for spec in sys.argv[2:]:
        sf, path = spec.split(":", 1)
        doc[sf] = parse(path)
    json.dump(doc, open(out_path, "w"), indent=1)
    print(out_path, {k: (v["n_pass"], v["n_fail"])
                     for k, v in doc.items() if isinstance(v, dict)
                     and "n_pass" in v})


if __name__ == "__main__":
    main()
