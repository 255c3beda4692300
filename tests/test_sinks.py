"""Resumable partitioned Parquet sink (raykg/sinks.py): exactly-once
per partition across reruns, atomic publish, manifest-driven skip."""

import json
import os

import numpy as np
import pandas as pd

import ray.data as rd

from raykg.sinks import load_manifest, resumable_write_parquet


def _readback(out: str) -> pd.DataFrame:
    files = [os.path.join(out, d, "data.parquet")
             for d in os.listdir(out) if d.startswith("part=")]
    return rd.read_parquet(files).to_pandas()


def _mtimes(out: str) -> dict:
    return {d: os.path.getmtime(os.path.join(out, d, "data.parquet"))
            for d in os.listdir(out) if d.startswith("part=")}


def test_resumable_sink_roundtrip_skip_and_resume(tmp_path):
    out = str(tmp_path / "sink")
    df = pd.DataFrame({"user_id": np.arange(1000, dtype=np.int64) % 37,
                       "v": np.arange(1000, dtype=np.int64)})

    man = resumable_write_parquet(
        rd.from_pandas(df).repartition(6), out, "user_id",
        partition_fn=lambda k: k % 8)
    assert len(man["done"]) == 8
    assert sum(man["done"].values()) == 1000
    back = _readback(out)
    assert sorted(back["v"]) == list(range(1000))
    assert "_part" not in back.columns

    # completed run: rerun writes nothing (mtimes unchanged)
    mt0 = _mtimes(out)
    resumable_write_parquet(
        rd.from_pandas(df).repartition(6), out, "user_id",
        partition_fn=lambda k: k % 8)
    assert _mtimes(out) == mt0

    # simulated kill: one partition's file + manifest entry gone —
    # the rerun restores exactly that partition
    man = load_manifest(out)
    del man["done"]["3"]
    with open(os.path.join(out, "_MANIFEST.json"), "w") as f:
        json.dump(man, f)
    os.remove(os.path.join(out, "part=3", "data.parquet"))
    man2 = resumable_write_parquet(
        rd.from_pandas(df).repartition(6), out, "user_id",
        partition_fn=lambda k: k % 8)
    assert len(man2["done"]) == 8
    back2 = _readback(out)
    assert sorted(back2["v"]) == list(range(1000))
    # untouched partitions kept their mtimes
    mt2 = _mtimes(out)
    assert all(mt2[d] == mt0[d] for d in mt0 if d != "part=3")


def test_resumable_sink_string_partitions(tmp_path):
    out = str(tmp_path / "sink2")
    df = pd.DataFrame({"lang": ["en", "de", "en", "fr"],
                       "x": [1, 2, 3, 4]})
    man = resumable_write_parquet(rd.from_pandas(df), out, "lang")
    assert set(man["done"]) == {"en", "de", "fr"}
    assert man["done"]["en"] == 2
    back = _readback(out)
    assert sorted(back["x"]) == [1, 2, 3, 4]
