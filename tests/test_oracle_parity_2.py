"""Oracle-parity shard 2/4 — see tests/_oracle_parity_common.py for
the rationale (VERDICT r5 ask #2: per-file sharding so partest can
schedule the 397 per-query parity checks across workers)."""

import pytest

from _oracle_parity_common import make_duck_fixture, run_parity, shard_names

duck = make_duck_fixture()


@pytest.mark.parametrize("name", shard_names(2))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    run_parity(name, spark, sf_dir, duck)
