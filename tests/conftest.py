from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small & fast for unit tests


@pytest.fixture(scope="session")
def spark():
    from fcrepo3_rdf_extractor_spark.session import build_session

    spark = build_session("tests", cores=4, shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def cli_results(spark, tmp_path_factory):
    """Run ALL CLI integration scenarios (tests/cli_scenarios.py) once,
    concurrently, at first use; tests assert on the returned artifacts.
    Each scenario spawns fresh interpreter+JVM subprocesses (~15-25 s
    apiece); sequentially they were ~7 min of suite wall, overlapped
    they cost about the longest single chain. A scenario that raises is
    stored as its exception and re-raised in every test that consumes
    it (via ``cli_art``), so one broken scenario can't hide another's
    result."""
    from concurrent.futures import ThreadPoolExecutor

    from cli_scenarios import SCENARIOS

    base = tmp_path_factory.mktemp("cli")
    pool = ThreadPoolExecutor(max_workers=8)
    futs = {name: pool.submit(fn, spark, base / name)
            for name, fn in SCENARIOS.items()}
    yield futs
    pool.shutdown(wait=False, cancel_futures=True)


def cli_art(results: dict, name: str) -> dict:
    """Block on one scenario's future and return its artifacts (its
    failure, if any, raises here — in the consuming test). The rest of
    the farm keeps running in the background; a test only ever waits
    for its own scenario."""
    return results[name].result()


def pytest_collection_modifyitems(session, config, items):
    config._cli_farm_needed = any(
        "cli_results" in getattr(item, "fixturenames", ())
        for item in items
    )


@pytest.fixture(scope="session", autouse=True)
def _cli_farm_eager(request):
    """Kick the CLI farm off at the FIRST test's setup when this run
    collected any CLI test: the subprocesses then overlap the oracle
    sweep and the unit tests instead of starting when the (alphabetically
    late) CLI tests are reached. Runs that collect no CLI test skip the
    farm entirely."""
    if getattr(request.config, "_cli_farm_needed", False):
        request.getfixturevalue("cli_results")
    yield
