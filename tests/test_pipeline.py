import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from raykg.pipeline import PipelineConfig, list_epochs, run_pipeline


@pytest.fixture(scope="module")
def pipeline_out(small_fixture, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out"))
    res = run_pipeline(small_fixture, out, PipelineConfig())
    return small_fixture, out, res


def _triples(out):
    return rd.read_parquet(os.path.join(out, "triples")).to_pandas()


def test_runs_all_epochs(pipeline_out):
    fx, out, res = pipeline_out
    assert res["epochs_run"] == list_epochs(fx) == [0, 1, 2]


def test_triple_shapes(pipeline_out):
    _, out, _ = pipeline_out
    tri = _triples(out)
    assert set(tri.columns) == {"subj", "pred", "obj", "epoch", "conv_id"}
    preds = set(tri.pred.unique())
    assert preds == {"kg:linksTo", "kg:mentions", "kg:hasMember", "kg:label"}
    # dedup: no (s,p,o) duplicates
    assert not tri.duplicated(subset=["subj", "pred", "obj"]).any()


def test_every_gold_mention_linked(pipeline_out, small_fixture):
    _, out, _ = pipeline_out
    tri = _triples(out)
    gold = pq.read_table(os.path.join(small_fixture, "gold.parquet")).to_pandas()
    links = tri[tri.pred == "kg:linksTo"]
    linked_ids = set(int(s.split(":")[1]) for s in links.subj)
    assert linked_ids == set(gold.mention_id)


def test_incremental_linking_to_minted_entities(pipeline_out):
    """Entities minted in epoch k must be linkable from epoch k+1
    (scripts/eval_kbp.py:626-652 semantics)."""
    _, out, _ = pipeline_out
    tri = _triples(out)
    links = tri[tri.pred == "kg:linksTo"]
    nil_links = links[links.obj.str.startswith("nil:")]
    minted_epoch = nil_links.obj.str.split(":").str[1].astype(int)
    cross = nil_links[minted_epoch < nil_links.epoch]
    assert len(cross) > 0, "no later-epoch mention linked to a minted entity"
    # and never the other way (epoch k cannot see entities minted in k)
    assert (minted_epoch <= nil_links.epoch).all()


def test_linking_quality_vs_gold(pipeline_out, small_fixture):
    """Non-NIL gold mentions with exact-title surfaces should link to
    their gold KB entity."""
    _, out, _ = pipeline_out
    tri = _triples(out)
    gold = pq.read_table(os.path.join(small_fixture, "gold.parquet")).to_pandas()
    links = tri[tri.pred == "kg:linksTo"].copy()
    links["mention_id"] = links.subj.str.split(":").str[1].astype(int)
    merged = gold.merge(links, on="mention_id")
    exact = merged[(~merged.NIL) & (merged.mention == merged.Wikipedia_title)]
    correct = (
        exact.obj == "ent:kb:" + exact.Wikipedia_ID.astype(str)
    ).mean()
    assert correct > 0.95


def test_resume_skips_completed(pipeline_out, capsys):
    fx, out, _ = pipeline_out
    res2 = run_pipeline(fx, out, PipelineConfig())
    assert res2["epochs_run"] == []
    # rw state was rebuilt from the materialized deltas
    clusters = rd.read_parquet(os.path.join(out, "clusters")).to_pandas()
    assert res2["rw_total"] == len(clusters)


def test_lineage_records(pipeline_out):
    _, out, _ = pipeline_out
    for epoch in (0, 1, 2):
        p = os.path.join(out, "_lineage", f"epoch={epoch}.json")
        with open(p) as f:
            rec = json.load(f)
        assert rec["epoch"] == epoch
        assert "config" in rec and "input" in rec


def test_deterministic_across_runs(small_fixture, tmp_path_factory):
    out2 = str(tmp_path_factory.mktemp("out2"))
    run_pipeline(small_fixture, out2, PipelineConfig())
    out3 = str(tmp_path_factory.mktemp("out3"))
    run_pipeline(small_fixture, out3, PipelineConfig())
    a = _triples(out2).sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    b = _triples(out3).sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_surface_blocking_mode(small_fixture, tmp_path_factory):
    """The scale path (surface blocking) still produces a valid triple
    set covering every mention."""
    out = str(tmp_path_factory.mktemp("out_sb"))
    run_pipeline(small_fixture, out, PipelineConfig(blocking="surface"))
    tri = _triples(out)
    gold = pq.read_table(os.path.join(small_fixture, "gold.parquet")).to_pandas()
    links = tri[tri.pred == "kg:linksTo"]
    assert set(int(s.split(":")[1]) for s in links.subj) == set(gold.mention_id)


def test_epoch_with_no_nil_mentions(small_fixture, tmp_path_factory):
    """A NIL model that never fires leaves every epoch clusterless —
    the pipeline must still emit linksTo/mentions triples and resume
    state cleanly."""
    from raykg.nil import LogisticModel

    out = str(tmp_path_factory.mktemp("no_nil"))
    never_nil = LogisticModel(("max_bi", "secondiff"), (0.0, 0.0), 100.0)
    res = run_pipeline(
        small_fixture, out, PipelineConfig(nil_model=never_nil)
    )
    assert res["rw_total"] == 0
    tri = _triples(out)
    assert set(tri.pred.unique()) == {"kg:linksTo", "kg:mentions"}
    gold = pq.read_table(os.path.join(small_fixture, "gold.parquet")).to_pandas()
    links = tri[tri.pred == "kg:linksTo"]
    assert set(int(s.split(":")[1]) for s in links.subj) == set(gold.mention_id)


def test_fragment_resume_skips_finished_fragments(tmp_path_factory):
    """Mid-epoch resume: after a simulated kill (epoch incomplete, some
    fragments finished), the re-run re-executes ONLY the unfinished
    fragment and the final triples are identical to an uninterrupted
    run."""
    import json
    import shutil

    import pandas as pd

    from raykg import fixtures

    fx = str(tmp_path_factory.mktemp("frag_fx"))
    fixtures.write_fixture(
        fx, n_convs=48, n_kb=60, n_nil=8, n_tomb=3, n_epochs=2, seed=11,
        convs_per_part=8,  # -> 3 part files per epoch
    )
    cfg = PipelineConfig(n_fragments=3)

    out_full = str(tmp_path_factory.mktemp("frag_full"))
    run_pipeline(fx, out_full, cfg)
    tri_full = rd.read_parquet(os.path.join(out_full, "triples")).to_pandas()
    full_set = set(zip(tri_full.subj, tri_full.pred, tri_full.obj, tri_full.epoch))

    out = str(tmp_path_factory.mktemp("frag_out"))
    run_pipeline(fx, out, cfg)
    # simulate a kill during epoch 1: epoch not in manifest, fragment 1
    # unfinished (its lineage + output removed), fragments 0/2 finished
    mpath = os.path.join(out, "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    manifest["completed_epochs"] = [0]
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    shutil.rmtree(os.path.join(out, "mentions", "epoch=1", "frag_1"))
    os.remove(os.path.join(out, "_lineage", "epoch=1_frag=1.json"))

    res = run_pipeline(fx, out, cfg)
    assert res["epochs_run"] == [1]
    stats = res["stats"][0]
    assert stats["n_fragments"] == 3
    assert stats["fragments_skipped"] == 2  # only frag_1 re-ran

    tri = rd.read_parquet(os.path.join(out, "triples")).to_pandas()
    got = set(zip(tri.subj, tri.pred, tri.obj, tri.epoch))
    assert got == full_set


def test_no_incremental_mode(small_fixture, tmp_path_factory):
    """--no-incremental (eval_kbp.py:773-779): all epochs concatenated,
    one pass — a single epoch=0 output, no RW-index links between
    batches, and every turn still produces its triples."""
    out = str(tmp_path_factory.mktemp("noninc_out"))
    res = run_pipeline(small_fixture, out, PipelineConfig(),
                       incremental=False)
    assert res["epochs_run"] == [0]
    tri = rd.read_parquet(os.path.join(out, "triples")).to_pandas()
    assert set(tri.epoch) == {0}
    # incremental RW linking cannot happen in a single pass: no linksTo
    # object may be a minted nil: uri from a *different* (earlier) epoch
    lt = tri[(tri.pred == "kg:linksTo") & tri.obj.str.startswith("ent:nil:")]
    assert lt.empty  # minted entities only become retrievable NEXT epoch

    # the incremental run over the same input covers the same turns
    out2 = str(tmp_path_factory.mktemp("inc_out"))
    run_pipeline(small_fixture, out2, PipelineConfig())
    tri2 = rd.read_parquet(os.path.join(out2, "triples")).to_pandas()
    turns = lambda t: set(t[t.pred == "kg:mentions"].subj)
    assert turns(tri) == turns(tri2)


def test_hot_bucket_salting_merges_back():
    """Skew control: a Zipf-head surface salted into sub-groups must
    re-merge into ONE cluster covering every member (identical surfaces
    score far above the merge threshold)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from raykg.encode import HashEncoder, vectors_to_column
    from raykg.pipeline import (
        MAX_SALTS,
        _add_block_key,
        _assemble_clusters_table,
        _cluster_group,
    )

    n = 900
    enc = HashEncoder(dim=64)
    mentions = ["Hotname Corp"] * n
    E = enc.encode_mentions(mentions, [""] * n, [""] * n)
    t = pa.table(
        {
            "mention_id": pa.array(np.arange(n, dtype=np.int64)),
            "mention": pa.array(mentions, type=pa.string()),
            "context_left": pa.array([""] * n, type=pa.string()),
            "context_right": pa.array([""] * n, type=pa.string()),
            "encoding": vectors_to_column(E),
        }
    )
    t = _add_block_key(t, "surface")
    blk = t.column("block")[0].as_py()
    n_salts = 3
    salt_counts = np.ones(256, dtype=np.int64)
    salt_counts[blk] = n_salts
    mids = t.column("mention_id").to_numpy(zero_copy_only=False)
    keys = blk * MAX_SALTS + (mids % n_salts)
    t = t.set_column(t.column_names.index("block"), "block",
                     pa.array(keys, type=pa.int64()))
    parts = []
    for k in np.unique(keys):
        sub = t.filter(pa.compute.equal(t.column("block"), int(k)))
        parts.append(_cluster_group(sub, "greedy", salted=True).to_pandas())
    parts = pd.concat(parts, ignore_index=True)
    assert len(parts) == n_salts  # one sub-cluster per salt before merge
    tbl = _assemble_clusters_table(parts, epoch=0, dim=64,
                                   salt_counts=salt_counts)
    assert tbl.num_rows == 1
    got_ids = sorted(tbl.column("mention_ids")[0].as_py())
    assert got_ids == list(range(n))
    assert tbl.column("title")[0].as_py() == "Hotname Corp"
    assert tbl.column("nelements")[0].as_py() == n


def test_ivf_balance_knob_end_to_end(small_fixture, tmp_path_factory):
    """PipelineConfig(ivf_balance=...) threads through load_kb_handles
    (and make_kb_shards for the sharded path) — the pipeline completes
    and dedup holds. The recall/latency trade itself is pinned at the
    index level (test_index.py::test_ivf_balance_*)."""
    out = str(tmp_path_factory.mktemp("out_bal"))
    res = run_pipeline(
        small_fixture, out,
        PipelineConfig(ann="ivf", ivf_balance=1.5))
    assert res["epochs_run"] == [0, 1, 2]
    tri = _triples(out)
    assert len(tri) > 0
    assert not tri.duplicated(["subj", "pred", "obj"]).any()
