"""Command-line surface: ``python -m raykg <command>``.

The reference repo's user surface is a set of driver scripts invoked
from a shell (``scripts/eval_kbp.py``, ``scripts/incremental_dataset
.py`` — argparse CLIs around the pipeline loop); this module is the
equivalent for the Ray engine. The CLI OWNS the Ray session (per the
driver contract, the library itself never calls ``ray.init``).

Commands
--------
fixture   write a deterministic synthetic transcript fixture
pipeline  run the incremental KG pipeline on a fixture dir
query     run one named driver query (see ``--list``) over an sf dir
report    evaluation report (linking recall / NIL / clustering) for a
          finished pipeline output against the fixture's gold labels
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def _cmd_fixture(a: argparse.Namespace) -> int:
    _ray_session(a.num_cpus)
    from raykg.fixtures import write_fixture

    write_fixture(
        a.out_dir, n_convs=a.n_convs, n_kb=a.n_kb, n_nil=a.n_nil,
        n_tomb=a.n_tomb, n_epochs=a.n_epochs, seed=a.seed, dim=a.dim,
    )
    with open(os.path.join(a.out_dir, "fixture_manifest.json")) as f:
        print(json.dumps(json.load(f)))
    return 0


def _cmd_pipeline(a: argparse.Namespace) -> int:
    _ray_session(a.num_cpus)
    from raykg.pipeline import PipelineConfig, run_pipeline

    cfg = PipelineConfig(
        blocking=a.blocking, clusterer=a.clusterer, ann=a.ann,
        kb_shards=a.kb_shards, dim=a.dim,
    )
    res = run_pipeline(
        a.fixture_dir, a.out_dir, cfg,
        epochs=[int(e) for e in a.epochs.split(",")] if a.epochs else None,
        resume=not a.no_resume, incremental=not a.no_incremental,
    )
    print(json.dumps(res))
    return 0


def _cmd_query(a: argparse.Namespace) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    qs = entry.queries()
    if a.list or a.name is None:
        for name in sorted(qs):
            mark = "*" if name in entry.oracle_sql() else " "
            print(f"{mark} {name}")
        return 0
    if a.name not in qs:
        print(f"unknown query {a.name!r}; --list shows all", file=sys.stderr)
        return 2
    _ray_session(a.num_cpus)
    res = qs[a.name](a.sf_dir)
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
    elif isinstance(res, pa.Table):
        df = res.to_pandas()
    else:
        df = res
    if a.out:
        df.to_parquet(a.out, index=False)
        print(json.dumps({"query": a.name, "rows": len(df), "out": a.out}))
    else:
        with pd.option_context("display.max_rows", a.head):
            print(df.head(a.head).to_string(index=False))
        print(json.dumps({"query": a.name, "rows": len(df)}))
    return 0


def _cmd_report(a: argparse.Namespace) -> int:
    _ray_session(a.num_cpus)
    from raykg.report import run_eval

    _, flat = run_eval(a.out_dir, a.fixture_dir, report_csv=a.csv)
    print(flat.to_string(index=False))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="raykg", description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--num-cpus", type=int, default=None, dest="num_cpus")
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("fixture", help="write a synthetic transcript fixture")
    f.add_argument("out_dir")
    f.add_argument("--n-convs", type=int, default=200)
    f.add_argument("--n-kb", type=int, default=300)
    f.add_argument("--n-nil", type=int, default=30)
    f.add_argument("--n-tomb", type=int, default=10)
    f.add_argument("--n-epochs", type=int, default=5)
    f.add_argument("--seed", type=int, default=42)
    f.add_argument("--dim", type=int, default=64)
    f.set_defaults(fn=_cmd_fixture)

    r = sub.add_parser("pipeline", help="run the incremental KG pipeline")
    r.add_argument("fixture_dir")
    r.add_argument("out_dir")
    r.add_argument("--blocking", default="global",
                   choices=["global", "surface"])
    r.add_argument("--clusterer", default="greedy",
                   choices=["greedy", "feature", "threestep"])
    r.add_argument("--ann", default="exact", choices=["exact", "ivf", "pq"])
    r.add_argument("--kb-shards", type=int, default=1)
    r.add_argument("--dim", type=int, default=64)
    r.add_argument("--epochs", default=None,
                   help="comma-separated epoch ids (default: all)")
    r.add_argument("--no-resume", action="store_true")
    r.add_argument("--no-incremental", action="store_true",
                   help="reference --no-incremental mode: one joint batch")
    r.set_defaults(fn=_cmd_pipeline)

    q = sub.add_parser("query", help="run one named driver query")
    q.add_argument("name", nargs="?")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--list", action="store_true",
                   help="list queries (* = oracle-checked)")
    q.add_argument("--head", type=int, default=10)
    q.add_argument("--out", default=None, help="write result parquet here")
    q.set_defaults(fn=_cmd_query)

    e = sub.add_parser("report", help="evaluation report for a pipeline run")
    e.add_argument("out_dir")
    e.add_argument("fixture_dir")
    e.add_argument("--csv", default=None)
    e.set_defaults(fn=_cmd_report)

    a = p.parse_args(argv)
    return a.fn(a)


if __name__ == "__main__":
    raise SystemExit(main())
