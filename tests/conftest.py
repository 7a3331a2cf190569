from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def pytest_collection_finish(session):
    """Keep README's 'NNN tests' line GENERATED, not hand-synced (it
    drifted twice in round 9): on any full-suite collection (no -k/-m
    filter, target = tests/ or the repo root — including
    --collect-only), rewrite the count in place if it desynced."""
    config = session.config
    if config.option.keyword or config.option.markexpr:
        return
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(tests_dir)
    args = [os.path.abspath(a.split("::")[0]) for a in config.args]
    if not args or any(a not in (tests_dir, repo_root) for a in args):
        return
    import re
    import warnings

    readme = os.path.join(repo_root, "README.md")
    with open(readme) as f:
        src = f.read()
    new = re.sub(r"\b\d+ tests:", f"{len(session.items)} tests:", src, count=1)
    if new != src:
        with open(readme, "w") as f:
            f.write(new)
        warnings.warn(
            f"README.md test count resynced to {len(session.items)} "
            "(collected by full-suite run)",
            stacklevel=1,
        )


@pytest.fixture(scope="session")
def spark():
    from amazon_kinesis_analytics_streaming_etl_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def tmp_dirs(tmp_path):
    d = {
        "src": str(tmp_path / "src"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["src"])
    return d


VALID_EVENT = {
    "vendor_id": 2,
    "pickup_datetime": "2018-11-23T20:30:14",
    "dropoff_datetime": "2018-11-23T20:41:02",
    "passenger_count": 1,
    "trip_distance": 2.3,
    "ratecode_id": 1,
    "store_and_fwd_flag": "N",
    "pickup_location_id": 142,
    "dropoff_location_id": 236,
    "payment_type": 1,
    "fare_amount": 10.5,
    "extra": 0.5,
    "mta_tax": 0.5,
    "tip_amount": 2.36,
    "tolls_amount": 0.0,
    "improvement_surcharge": 0.3,
    "total_amount": 14.16,
    "trip_id": 9000001,
    "type": "trip",
    "padding": "",
}


@pytest.fixture()
def valid_event():
    return dict(VALID_EVENT)
