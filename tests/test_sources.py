import json

import numpy as np

from raykg.encode import HashEncoder
from raykg.sources import read_entity_catalogue, read_mention_batches


def test_entity_catalogue_reader(tmp_path):
    path = tmp_path / "entity.jsonl"
    rows = [
        {"idx": "https://en.wikipedia.org/wiki?curid=42", "title": "Alpha Beta",
         "entity": "Alpha Beta is a thing"},
        {"idx": "7", "title": "X" * 150, "entity": ""},
    ]
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    out = read_entity_catalogue(str(path), dim=16).to_pandas()
    assert out.wikipedia_id.tolist() == [42, 7]
    assert out.title.iloc[1] == "X" * 100  # varchar(100) truncation
    emb = np.asarray(out.embedding.iloc[0], dtype=np.float32)
    want = HashEncoder(dim=16).encode_entities(
        ["Alpha Beta"], ["Alpha Beta is a thing"]
    )[0]
    np.testing.assert_array_equal(emb, want)


def test_mention_batch_reader(tmp_path):
    path = tmp_path / "batch0.jsonl"
    rows = [
        {"mention": "Alpha", "context_left": "l", "context_right": "r",
         "Wikipedia_ID": 42, "Wikipedia_title": "Alpha Beta", "NIL": False,
         "extra_col": 1},
    ]
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    out = read_mention_batches(str(path)).to_pandas()
    assert set(out.columns) == {
        "mention", "context_left", "context_right", "Wikipedia_ID",
        "Wikipedia_title", "NIL",
    }
    assert out.mention.tolist() == ["Alpha"]


def test_stratified_epoch_split_balances_nil():
    """O6: the epoch split is stratified on the NIL class
    (create_dataset.Rmd:611-659) — every epoch gets a fair share of NIL
    mentions, not whatever ordinal % n_epochs gives."""
    import numpy as np

    from raykg.fixtures import generate_world

    _, _, gold = generate_world(
        n_convs=120, n_kb=80, n_nil=15, n_tomb=5, n_epochs=4, seed=3
    )
    nil = gold[gold["NIL"]]
    per_epoch = nil.groupby("batch").size().reindex(range(4), fill_value=0)
    assert (per_epoch > 0).all()
    # fair distribution: no epoch deviates more than 35% from the mean
    mean = per_epoch.mean()
    assert (np.abs(per_epoch - mean) <= 0.35 * mean + 2).all(), per_epoch.to_dict()
