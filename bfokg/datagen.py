"""Deterministic synthetic transcripts generator (input_hint shape).

BASELINE.json input_hint: Iceberg table of multi-turn conversation/agent
transcripts ``(conv_id STRING, turn_idx INT, role STRING, text STRING,
tool STRING, ts TIMESTAMP)``. No external data exists for this shape, so we
synthesize it deterministically (numpy RandomState(42)) at small scale for
tests/benches — the driver's TPC-H-ish tables stay untouched.

Mentions planted in turn text are drawn from the 29 reference fixture
entities (FIXTURES.md §4) so expected mentions, links, triples and BFO
assignments are derivable exactly. Relation sentences follow a closed
grammar (``RELATION_PREDICATES``) so (subj, pred, obj) ground truth is
known by construction.

The generator writes plain parquet with pyarrow (no Spark needed) and is
idempotent — an existing output dir is reused, which also lets the DuckDB
oracle read the very same bytes the Spark queries read.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .fixtures import _FIXTURES

SEED = 42
DATA_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")

# closed relation grammar: (predicate_id, sentence template)
RELATION_PREDICATES = [
    ("related_to", "{s} is related to {o}."),
    ("located_in", "{s} is located in {o}."),
    ("part_of", "{s} is part of {o}."),
    ("studied_by", "{s} was studied by {o}."),
    ("influenced", "{s} influenced {o}."),
]

_USER_TEMPLATES = [
    "Tell me about {m}.",
    "What do you know about {m}?",
    "Can you explain {m} please?",
    "I was reading about {m} yesterday.",
]

_ASSISTANT_TEMPLATES = [
    "{m} is {d}. {rel}",
    "Sure — {m} refers to {d}. {rel}",
    "{m}: {d}. {rel}",
]

_TOOLS = [None, None, None, "search", "lookup", None]

ROLES_CYCLE = ["user", "assistant", "assistant", "user", "assistant", "tool"]

BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)


def sf_to_n_turns(sf: float) -> int:
    """Scale factor → turn count, mirroring TESTDATA.md tiers
    (sf0.001→600, sf0.01→6k, sf0.1→60k)."""
    return max(60, int(round(sf * 600_000)))


def transcripts_path(sf: float) -> str:
    return os.path.join(DATA_ROOT, "transcripts", f"sf{sf:g}")


def _entity_surface(rng: np.random.RandomState, idx: int) -> str:
    """Label or one of its aliases, picked deterministically."""
    eid, label, _desc, aliases, _gt = _FIXTURES[idx]
    forms = [label] + list(aliases)
    return forms[rng.randint(len(forms))]


def generate_transcripts(sf: float, overwrite: bool = False) -> str:
    """Generate (if absent) and return the parquet directory for ``sf``."""
    out_dir = transcripts_path(sf)
    out_file = os.path.join(out_dir, "transcripts.parquet")
    if os.path.exists(out_file) and not overwrite:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    rng = np.random.RandomState(SEED)
    n_turns = sf_to_n_turns(sf)
    turns_per_conv = 6
    n_convs = max(1, n_turns // turns_per_conv)

    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    n_fix = len(_FIXTURES)
    for c in range(n_convs):
        conv_id = f"conv_{c:08d}"
        # each conversation is "about" one anchor entity
        anchor = rng.randint(n_fix)
        for t in range(turns_per_conv):
            role = ROLES_CYCLE[t % len(ROLES_CYCLE)]
            tool = _TOOLS[rng.randint(len(_TOOLS))] if role == "tool" else None
            if role == "user":
                m = _entity_surface(rng, anchor)
                text = _USER_TEMPLATES[rng.randint(len(_USER_TEMPLATES))].format(m=m)
            elif role == "assistant":
                eid, label, desc, _aliases, _gt = _FIXTURES[anchor]
                other = rng.randint(n_fix)
                pred_i = rng.randint(len(RELATION_PREDICATES))
                _pid, tmpl = RELATION_PREDICATES[pred_i]
                rel = tmpl.format(s=label, o=_FIXTURES[other][1])
                text = _ASSISTANT_TEMPLATES[rng.randint(len(_ASSISTANT_TEMPLATES))].format(
                    m=label, d=desc, rel=rel
                )
            else:  # tool turn: structured-ish output, still mentions the anchor
                text = f"result: {_FIXTURES[anchor][1]} [ok]"
            conv_ids.append(conv_id)
            turn_idxs.append(t)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            tss.append(BASE_TS + timedelta(seconds=int(c) * 60 + t))

    table = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
        }
    )
    pq.write_table(table, out_file)
    return out_dir


def sf_from_dir(sf_dir: str) -> float:
    """'/root/testdata/sf0.01' → 0.01 (defaults to 0.01 when unparseable)."""
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.01
