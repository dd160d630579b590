#!/usr/bin/env python
"""Regenerate the registry's attested-key set from the driver's
CORRECTNESS_r*.json files.

The driver attests only the first 50 entries of ``queries()`` per round, so
``registry.py`` orders not-yet-attested ops first (``_ATTESTED``).  Run
this at the start of each round to fold the latest round's attested keys in:

    python scripts/update_attested.py          # prints the union + diff
    python scripts/update_attested.py --write  # rewrites registry.py in place

Keys are read from every CORRECTNESS_r*.json in the repo root (any of the
shapes the driver has used: {"results": {key: ...}} or {key: ...} or a list
of {"name"/"key"/"query": ...} rows).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REG = os.path.join(ROOT, "esxsnmp_tsdb_spark", "registry.py")


def keys_from(path: str) -> set[str]:
    with open(path) as f:
        doc = json.load(f)
    if isinstance(doc, dict):
        inner = doc.get("results", doc.get("queries", doc))
        if isinstance(inner, dict):
            return set(inner)
        doc = inner
    out: set[str] = set()
    if isinstance(doc, list):
        for row in doc:
            if isinstance(row, dict):
                for k in ("name", "key", "query", "op"):
                    if k in row:
                        out.add(row[k])
                        break
    return out


def main() -> int:
    attested: set[str] = set()
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        ks = keys_from(path)
        print(f"{os.path.basename(path)}: {len(ks)} attested keys")
        attested |= ks
    sys.path.insert(0, ROOT)
    from esxsnmp_tsdb_spark import registry

    registry.load_all()
    known = set(registry.QUERIES)
    attested &= known  # ignore keys renamed/removed since attestation
    current = set(registry._ATTESTED)
    new = attested - current
    print(f"union: {len(attested)} of {len(known)} registered ops attested")
    print(f"newly attested since the set in registry.py: {len(new)}")
    if not new:
        return 0
    if "--write" not in sys.argv:
        print("(dry run — pass --write to update registry.py)")
        return 0
    lines = ",\n".join(
        "        " + ", ".join(repr(k) for k in chunk)
        for chunk in [sorted(attested)[i : i + 4] for i in range(0, len(attested), 4)]
    )
    src = open(REG).read()
    pat = re.compile(r"_ATTESTED = frozenset\(\s*\{.*?\}\s*\)", re.S)
    repl = "_ATTESTED = frozenset(\n    {\n" + lines + ",\n    }\n)"
    new_src, n = pat.subn(repl, src)
    assert n == 1, "could not locate the attested-set literal"
    open(REG, "w").write(new_src)
    print(f"registry.py updated: attested set now {len(attested)} keys")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
