"""Deterministic synthetic fixtures: transcripts + KB + gold mentions.

Stands in for the reference's WikilinksNED-derived JSONL batches and the
5.9M-entity Wikipedia KB (``notebooks/create_dataset.Rmd:669-705``,
``scripts/postgres_populate_entities.py``) with a fully seeded synthetic
world (FIXTURES.md):

  * ``kb_entities`` — background KB with hash-encoder embeddings.
    NIL entities mirror the reference's setup
    (``notebooks/create_dataset.Rmd:900-932``): some are *tombstones*
    (vector kept in the index, metadata deleted — exercising the dummy
    candidate path, ``pipeline/indexer/main.py:121-135``) and some never
    existed in the KB at all.
  * ``transcripts`` — multi-turn conversations (conv_id, turn_idx, role,
    text, tool, ts per BASELINE.json input_hint) rendered from lowercase
    templates with Capitalized entity surface forms embedded
    (exact / typo / abbreviation variants; Zipf head-entity skew).
  * ``gold_mentions`` — char offsets + gold entity labels recorded while
    rendering; used by the eval suite only, never by the pipeline.

Everything is reproducible from ``seed``; mention ids are ordered by
(conv_id, turn_idx, start_pos) and computable locally per turn.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raykg.encode import HashEncoder, vectors_to_column
from raykg.schema import DIM, INDEXER_KB

_CONS = ["b", "d", "f", "g", "k", "l", "m", "n", "p", "r", "s", "t", "v", "z"]
_VOW = ["a", "e", "i", "o", "u"]

_TEMPLATES_0 = [
    "so the deployment finished without any incident last night",
    "we should circle back on the budget review tomorrow morning",
    "the logs look clean after the rollback we did earlier",
    "nothing new on the incident channel since the last update",
]
_TEMPLATES_1 = [
    "the user asked about {} during the call",
    "we migrated the workload from {} last quarter",
    "there is an open ticket mentioning {} again",
    "support escalated a question regarding {} this morning",
    "the report cites {} as the main dependency",
]
_TEMPLATES_2 = [
    "we compared {} with {} before signing off",
    "the contract between {} and {} was renewed",
    "both {} and {} appear in the audit trail",
    "{} acquired a stake in {} according to the filing",
]
_TEMPLATES_3 = [
    "the panel included {} and {} alongside {}",
    "{} partnered with {} to supply parts for {}",
    "analysts ranked {} above {} but below {}",
]

_CATEGORIES = ["company", "framework", "protocol", "laboratory", "foundation"]
_PLACES = ["the northern region", "the delta area", "the coastal zone", "the old district"]
_TOOLS = ["search", "calculator", "browser", "db_query"]


def _make_words(rng: np.random.Generator, n: int, syllables: int) -> list[str]:
    words = set()
    out = []
    while len(out) < n:
        w = "".join(
            rng.choice(_CONS) + rng.choice(_VOW) for _ in range(syllables)
        )
        w = w.capitalize()
        if w not in words:
            words.add(w)
            out.append(w)
    return out


def _make_titles(rng: np.random.Generator, n: int) -> list[str]:
    first = _make_words(rng, max(40, int(np.sqrt(n)) * 2), 3)
    second = _make_words(rng, max(40, int(np.sqrt(n)) * 2), 2)
    titles = set()
    out = []
    while len(out) < n:
        t = f"{first[rng.integers(len(first))]} {second[rng.integers(len(second))]}"
        if t not in titles:
            titles.add(t)
            out.append(t)
    return out


def _typo(rng: np.random.Generator, title: str) -> str:
    """Swap two adjacent interior characters of the longest word."""
    words = title.split(" ")
    wi = int(np.argmax([len(w) for w in words]))
    w = words[wi]
    if len(w) >= 4:
        i = int(rng.integers(1, len(w) - 2))
        w = w[:i] + w[i + 1] + w[i] + w[i + 2:]
        words[wi] = w
    return " ".join(words)


def _variant(rng: np.random.Generator, title: str) -> str:
    r = rng.random()
    if r < 0.70:
        return title
    if r < 0.85:
        return _typo(rng, title)
    return title.split(" ")[0]  # abbreviation: first word


def generate_world(
    n_convs: int = 200,
    n_kb: int = 300,
    n_nil: int = 30,
    n_tomb: int = 10,
    n_epochs: int = 5,
    seed: int = 42,
    dim: int = DIM,
    encoder_spec: str = "hash",
):
    """Returns (transcripts_df, kb_df, gold_df). Deterministic in seed."""
    from raykg.encode import make_encoder

    rng = np.random.default_rng(seed)
    encoder = make_encoder(encoder_spec, dim=dim)

    n_entities = n_kb + n_tomb + n_nil
    titles = _make_titles(rng, n_entities)
    # layout: [0, n_kb) normal KB; [n_kb, n_kb+n_tomb) tombstones
    # (indexed, metadata deleted); [n_kb+n_tomb, n_entities) never-in-KB.
    wikipedia_ids = np.arange(n_entities, dtype=np.int64) + 1001
    descrs = [
        f"{t} is a {_CATEGORIES[i % len(_CATEGORIES)]} from {_PLACES[i % len(_PLACES)]}"
        for i, t in enumerate(titles)
    ]

    n_indexed = n_kb + n_tomb
    emb = encoder.encode_entities(titles[:n_indexed], descrs[:n_indexed])
    kb = pd.DataFrame(
        {
            "id": np.arange(n_indexed, dtype=np.int64),
            "indexer": np.full(n_indexed, INDEXER_KB, dtype=np.int32),
            "wikipedia_id": wikipedia_ids[:n_indexed],
            "title": titles[:n_indexed],
            "descr": descrs[:n_indexed],
            "type_": [_CATEGORIES[i % len(_CATEGORIES)] for i in range(n_indexed)],
            "tombstone": np.arange(n_indexed) >= n_kb,
        }
    )
    kb_emb = emb  # row-aligned with kb

    # Zipf skew over entities (head-entity skew per
    # notebooks/create_dataset.Rmd:133-136). Sampling goes through the
    # inverse CDF (searchsorted) so drawing is O(log n) per mention,
    # not O(n) — required for large synthetic KBs. Within-turn entity
    # repeats are allowed (a turn can mention the same entity twice).
    ranks = np.arange(1, n_entities + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()
    cum = np.cumsum(probs)
    ent_order = rng.permutation(n_entities)  # decouple rank from id

    def draw_entities(k: int) -> np.ndarray:
        return ent_order[np.searchsorted(cum, rng.random(k), side="right")]

    trans_rows = []
    gold_rows = []
    base_ts = np.datetime64("2026-01-01T00:00:00", "us")
    n_turn_choices = np.array([4, 6, 8, 10, 12])
    k_probs = np.array([0.25, 0.40, 0.25, 0.10])

    for ci in range(n_convs):
        conv_id = f"conv_{ci:07d}"
        epoch = 0  # placeholder; stratified assignment happens below
        n_turns = int(n_turn_choices[rng.integers(len(n_turn_choices))])
        for ti in range(n_turns):
            role = "user" if ti % 2 == 0 else "assistant"
            tool = ""
            if role == "assistant" and rng.random() < 0.15:
                role = "tool"
                tool = _TOOLS[int(rng.integers(len(_TOOLS)))]
            k = int(rng.choice(4, p=k_probs))
            if k == 0:
                text = _TEMPLATES_0[int(rng.integers(len(_TEMPLATES_0)))]
            else:
                tmpl = [_TEMPLATES_1, _TEMPLATES_2, _TEMPLATES_3][k - 1]
                template = tmpl[int(rng.integers(len(tmpl)))]
                ents = draw_entities(k)
                surfaces = [_variant(rng, titles[e]) for e in ents]
                parts = template.split("{}")
                text = ""
                for j, surf in enumerate(surfaces):
                    prefix = parts[j]
                    start = len(text) + len(prefix)
                    text += prefix + surf
                    end = start + len(surf)
                    mention_id = (np.int64(ci) * 100 + ti) * 10 + j
                    gold_rows.append(
                        (
                            mention_id,
                            conv_id,
                            ti,
                            start,
                            end,
                            surf,
                            int(wikipedia_ids[ents[j]]),
                            titles[ents[j]],
                            bool(ents[j] >= n_kb),  # tombstone or never-in-KB => NIL
                            epoch,
                        )
                    )
                text += parts[-1]
            trans_rows.append(
                (
                    conv_id,
                    ti,
                    role,
                    text,
                    tool,
                    base_ts + np.timedelta64(ci, "h") + np.timedelta64(30 * ti, "s"),
                    epoch,
                )
            )

    transcripts = pd.DataFrame(
        trans_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts", "epoch"]
    )
    transcripts["turn_idx"] = transcripts["turn_idx"].astype(np.int32)

    # Stratified epoch split (StratifiedKFold equivalent,
    # ``notebooks/create_dataset.Rmd:611-659``: the NIL class "is fairly
    # distributed among the batches"): stratify conversations by their
    # NIL-mention count bucket, deal each stratum round-robin over
    # epochs after a seeded shuffle — every epoch gets its fair share of
    # NIL mentions instead of whatever `ordinal % n_epochs` happens to
    # give.
    nil_per_conv = np.zeros(n_convs, dtype=np.int64)
    for row in gold_rows:
        if row[8]:  # NIL flag
            nil_per_conv[int(row[1].rsplit("_", 1)[1])] += 1
    strata = np.minimum(nil_per_conv, 3)
    conv_epoch = np.zeros(n_convs, dtype=np.int32)
    for s in np.unique(strata):
        members = np.flatnonzero(strata == s)
        members = members[rng.permutation(len(members))]
        conv_epoch[members] = np.arange(len(members)) % n_epochs
    epoch_of = {f"conv_{ci:07d}": int(conv_epoch[ci]) for ci in range(n_convs)}
    transcripts["epoch"] = (
        transcripts["conv_id"].map(epoch_of).astype(np.int32)
    )
    gold_rows = [
        row[:9] + (epoch_of[row[1]],) for row in gold_rows
    ]

    gold = pd.DataFrame(
        gold_rows,
        columns=[
            "mention_id",
            "conv_id",
            "turn_idx",
            "start_pos",
            "end_pos",
            "mention",
            "Wikipedia_ID",
            "Wikipedia_title",
            "NIL",
            "batch",
        ],
    )
    for c, t in [("turn_idx", np.int32), ("start_pos", np.int32),
                 ("end_pos", np.int32), ("batch", np.int32)]:
        gold[c] = gold[c].astype(t)

    return transcripts, (kb, kb_emb), gold


def write_fixture(
    out_dir: str,
    n_convs: int = 200,
    n_kb: int = 300,
    n_nil: int = 30,
    n_tomb: int = 10,
    n_epochs: int = 5,
    seed: int = 42,
    dim: int = DIM,
    convs_per_part: int = 512,
    encoder_spec: str = "hash",
) -> dict:
    """Writes transcripts/ (hive-partitioned by epoch, several part
    files per epoch), kb.parquet, gold.parquet under ``out_dir``.
    Idempotent: skips if the manifest for the same parameters already
    exists."""
    import json

    params = dict(
        n_convs=n_convs, n_kb=n_kb, n_nil=n_nil, n_tomb=n_tomb,
        n_epochs=n_epochs, seed=seed, dim=dim,
        convs_per_part=convs_per_part,
    )
    if encoder_spec != "hash":  # keep old manifests valid
        params["encoder_spec"] = encoder_spec
    manifest_path = os.path.join(out_dir, "fixture_manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            if json.load(f).get("params") == params:
                return params
    gen_params = {k: v for k, v in params.items() if k != "convs_per_part"}
    transcripts, (kb, kb_emb), gold = generate_world(**gen_params)
    os.makedirs(out_dir, exist_ok=True)
    # regenerating over a stale dir (e.g. params changed) must not leave
    # old part files beside the new layout — duplicated rows + a giant
    # unsplittable file silently poison every downstream read
    import shutil

    shutil.rmtree(os.path.join(out_dir, "transcripts"), ignore_errors=True)
    for epoch in range(n_epochs):
        part = transcripts[transcripts["epoch"] == epoch].drop(columns=["epoch"])
        pdir = os.path.join(out_dir, "transcripts", f"epoch={epoch}")
        os.makedirs(pdir, exist_ok=True)
        # several part files per epoch (whole conversations per part),
        # like any real sharded input — this is what per-fragment
        # pipeline resume keys on
        convs = part["conv_id"].unique()
        n_parts = max(1, (len(convs) + convs_per_part - 1) // convs_per_part)
        for j in range(n_parts):
            sel = set(convs[j * convs_per_part : (j + 1) * convs_per_part])
            chunk = part[part["conv_id"].isin(sel)]
            # small row groups keep the files SPLITTABLE: Ray can only
            # divide a parquet file into blocks at row-group boundaries,
            # and a single giant row group caps read parallelism at one
            # task per file
            pq.write_table(
                pa.Table.from_pandas(chunk, preserve_index=False)
                .replace_schema_metadata(None),
                os.path.join(pdir, f"part-{j:04d}.parquet"),
                row_group_size=1024,
            )
    kb_table = pa.Table.from_pandas(kb, preserve_index=False).replace_schema_metadata(None).append_column(
        "embedding", vectors_to_column(kb_emb)
    )
    pq.write_table(kb_table, os.path.join(out_dir, "kb.parquet"))
    pq.write_table(
        pa.Table.from_pandas(gold, preserve_index=False).replace_schema_metadata(None),
        os.path.join(out_dir, "gold.parquet"),
    )
    with open(manifest_path, "w") as f:
        json.dump({"params": params, "n_turns": len(transcripts),
                   "n_mentions": len(gold)}, f)
    return params
