"""S4: ontology loaders for real HPO dumps.

Supports the reference's ``hpo.json`` node layout (dict-of-dicts keyed by
``HP:...`` with ``Name/Alt_id/Synonym/Is_a`` fields, util.py:27-44) and a
minimal ``.obo`` parser, normalized into the node format HpoDag consumes.
Assets build once on the driver and broadcast (SURVEY.md §2.5).
"""

from __future__ import annotations

import json
import re

from .hpo_dag import HpoDag


def _norm_strlist(v) -> list[str]:
    if v is None:
        return []
    if isinstance(v, str):
        return [v]
    return list(v)


def dag_from_hpo_json(path: str) -> HpoDag:
    """Load the reference's hpo.json format (util.py:284-285)."""
    with open(path, encoding="utf-8") as f:
        data = json.load(f)
    nodes = {}
    for hpo, d in data.items():
        nodes[hpo] = {
            "name": _norm_strlist(d.get("Name")),
            "synonym": [
                _extract_quoted(s) for s in _norm_strlist(d.get("Synonym"))
            ],
            "alt_id": _norm_strlist(d.get("Alt_id")),
            "is_a": [s.split(" !")[0].strip() for s in _norm_strlist(d.get("Is_a"))],
        }
    return HpoDag(nodes)


_QUOTED = re.compile(r'"([^"]*)"')


def _extract_quoted(s: str) -> str:
    m = _QUOTED.search(s)
    return m.group(1) if m else s


def dag_from_obo(path: str) -> HpoDag:
    """Minimal .obo term parser (public OBO format)."""
    nodes: dict[str, dict] = {}
    cur: dict | None = None
    cur_id = None
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line == "[Term]":
                cur, cur_id = {"name": [], "synonym": [], "alt_id": [], "is_a": []}, None
            elif cur is not None:
                if line.startswith("id: "):
                    cur_id = line[4:]
                    nodes[cur_id] = cur
                elif line.startswith("name: "):
                    cur["name"].append(line[6:])
                elif line.startswith("synonym: "):
                    cur["synonym"].append(_extract_quoted(line[9:]))
                elif line.startswith("alt_id: "):
                    cur["alt_id"].append(line[8:])
                elif line.startswith("is_a: "):
                    cur["is_a"].append(line[6:].split(" !")[0].strip())
                elif not line:
                    cur = None
    return HpoDag(nodes)
