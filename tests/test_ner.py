"""Trainable NER in the detection seam (reference: Flair tagger slot,
``pipeline/biencoder/blink/ner.py:29-42``): an averaged structured
perceptron trained on epoch-0 gold spans must (a) recover the fixture's
span semantics on held-out epochs and (b) drop into the same
``map_batches`` slot as the rule-based detector with identical output —
proving the detect stage is model-pluggable end-to-end."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data as rd

from raykg import fixtures
from raykg.detect import detect_mentions
from raykg.ner import (
    PerceptronTagger,
    TaggerDetector,
    _hash_feature,
    _token_features,
    _tokenize_with_offsets,
    spans_from_tags,
    train_tagger_from_gold,
)


@pytest.fixture(scope="module")
def world():
    tr, (kb, emb), gold = fixtures.generate_world(
        n_convs=50, n_kb=70, n_nil=10, n_tomb=4, n_epochs=3, seed=42
    )
    return tr, gold


@pytest.fixture(scope="module")
def trained(world):
    tr, gold = world
    tagger = train_tagger_from_gold(
        pa.Table.from_pandas(tr[tr.epoch == 0]),
        pa.Table.from_pandas(gold[gold.batch == 0]),
        epochs=5,
    )
    return tagger.averaged()


def test_holdout_f1(world, trained):
    """Span-level F1 on epochs the tagger never saw."""
    tr, gold = world
    w, t = trained
    inf = PerceptronTagger()
    inf.w, inf.t = w.astype(np.float64), t.astype(np.float64)
    spans_by = {}
    for _, r in gold[gold.batch > 0].iterrows():
        spans_by.setdefault((r.conv_id, r.turn_idx), []).append(
            (r.start_pos, r.end_pos)
        )
    tp = fp = fn = 0
    for _, r in tr[tr.epoch > 0].iterrows():
        toks, starts = _tokenize_with_offsets(r.text)
        if not toks:
            continue
        fi = [
            np.array([_hash_feature(f, inf.mask) for f in fs], dtype=np.int64)
            for fs in _token_features(toks)
        ]
        pred = set(spans_from_tags(toks, starts, inf._viterbi(inf._emissions(fi))))
        g = set(map(tuple, spans_by.get((r.conv_id, r.turn_idx), [])))
        tp += len(pred & g)
        fp += len(pred - g)
        fn += len(g - pred)
    p = tp / max(tp + fp, 1)
    r = tp / max(tp + fn, 1)
    f1 = 2 * p * r / max(p + r, 1e-9)
    assert f1 >= 0.98, (p, r, f1)


def test_stage_matches_rule_detector(world, trained, ray_session):
    """The learned tagger in the Ray stage slot produces the SAME
    mentions table as the rule-based stage (weights travel by ray.put
    ref, resolved once per worker) — downstream stages can't tell the
    difference."""
    tr, _ = world
    w, t = trained
    w_ref, t_ref = ray.put(w), ray.put(t)
    cols = tr[tr.epoch > 0][["conv_id", "turn_idx", "text"]]
    ds = rd.from_pandas(cols.reset_index(drop=True)).repartition(4)

    got = (
        ds.map_batches(
            TaggerDetector,
            fn_constructor_kwargs={"weights": w_ref, "transitions": t_ref},
            batch_format="pyarrow",
            concurrency=2,
        )
        .to_pandas()
        .sort_values("mention_id")
        .reset_index(drop=True)
    )
    want = (
        ds.map_batches(detect_mentions, batch_format="pyarrow")
        .to_pandas()
        .sort_values("mention_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in want.columns:
        assert (got[c] == want[c]).all(), c
