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
    last_hashed: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        ks = keys_from(path)
        rnd = int(re.search(r"_r0*(\d+)\.json$", path).group(1))
        print(f"{os.path.basename(path)}: {len(ks)} attested keys")
        attested |= ks
        for k in ks:
            last_hashed[k] = max(last_hashed.get(k, 0), rnd)
    sys.path.insert(0, ROOT)
    from esxsnmp_tsdb_spark import registry

    registry.load_all()
    known = set(registry.QUERIES)
    attested &= known  # ignore keys renamed/removed since attestation
    last_hashed = {k: n for k, n in last_hashed.items() if k in known}
    current = set(registry._ATTESTED)
    new = attested - current
    stale = {
        k: n for k, n in last_hashed.items() if registry._LAST_HASHED.get(k) != n
    }
    print(f"union: {len(attested)} of {len(known)} registered ops attested")
    print(f"newly attested since the set in registry.py: {len(new)}")
    print(f"_HASH_ROUND entries needing update: {len(stale)}")
    if not new and not stale:
        return 0
    if "--write" not in sys.argv:
        print("(dry run — pass --write to update registry.py)")
        return 0

    def block(keys: list[str], indent: str) -> str:
        return ",\n".join(
            indent + ", ".join(repr(k) for k in chunk)
            for chunk in [keys[i : i + 4] for i in range(0, len(keys), 4)]
        )

    src = open(REG).read()
    pat = re.compile(r"_ATTESTED = frozenset\(\s*\{.*?\}\s*\)", re.S)
    repl = "_ATTESTED = frozenset(\n    {\n" + block(sorted(attested), "        ") + ",\n    }\n)"
    src, n = pat.subn(repl, src)
    assert n == 1, "could not locate the attested-set literal"

    by_round: dict[int, list[str]] = {}
    for k, rnd in last_hashed.items():
        by_round.setdefault(rnd, []).append(k)
    rounds = "\n".join(
        f"    {rnd}: (\n" + block(sorted(by_round[rnd]), "        ") + ",\n    ),"
        for rnd in sorted(by_round)
    )
    pat = re.compile(r"_HASH_ROUND: dict\[int, tuple\[str, \.\.\.\]\] = \{.*?\n\}|_HASH_ROUND: dict\[int, tuple\[str, \.\.\.\]\] = \{\}", re.S)
    repl = "_HASH_ROUND: dict[int, tuple[str, ...]] = {\n" + rounds + "\n}"
    src, n = pat.subn(repl, src)
    assert n == 1, "could not locate the _HASH_ROUND literal"
    open(REG, "w").write(src)
    print(
        f"registry.py updated: attested set {len(attested)} keys, "
        f"_HASH_ROUND {len(last_hashed)} keys over {len(by_round)} rounds"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
