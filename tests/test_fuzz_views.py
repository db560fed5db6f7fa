"""View-plane fuzz: random create/replace/rollback/drop/query sequences
against a Python model of the version history.  Mirrors the repo's other
fuzz gates (seeded, failures reproduce with the printed seed)."""

import random

import pytest

from incubator_iceberg_spark import sqlfacade
from incubator_iceberg_spark.schema import Schema
from incubator_iceberg_spark.views import (NoSuchViewError,
                                           ViewAlreadyExistsError)

N_OPS = 60
NAMES = ["db.v0", "db.v1", "db.v2"]


@pytest.fixture()
def backing(warehouse, spark, sf_dir):
    src = (spark.read.parquet(f"{sf_dir}/orders.parquet")
           .select("o_orderkey", "o_totalprice").limit(200))
    t = warehouse.create_table("db.fz_orders", Schema.from_spark(src.schema))
    t.append(src)
    # modulus-residue filters the model can count exactly
    counts = {}
    for m in (2, 3, 5):
        for r in range(m):
            counts[(m, r)] = src.filter(f"o_orderkey % {m} = {r}").count()
    return counts


def _sql(m, r):
    return (f"SELECT o_orderkey FROM db.fz_orders "
            f"WHERE o_orderkey % {m} = {r}")


@pytest.mark.parametrize("seed", [901, 902])
def test_view_plane_fuzz(warehouse, spark, backing, seed):
    rng = random.Random(seed)
    # model[name] = {"versions": {vid: (m, r)}, "current": vid}
    model = {}

    for step in range(N_OPS):
        name = rng.choice(NAMES)
        op = rng.choice(["create", "replace", "rollback", "drop",
                         "query", "query_version", "inspect"])
        ctx = f"seed={seed} step={step} op={op} name={name}"
        m = rng.choice([2, 3, 5])
        r = rng.randrange(m)
        if op == "create":
            if name in model:
                with pytest.raises(ViewAlreadyExistsError):
                    warehouse.create_view(name, _sql(m, r), spark=spark)
            else:
                warehouse.create_view(name, _sql(m, r), spark=spark)
                model[name] = {"versions": {1: (m, r)}, "current": 1}
        elif op == "replace":
            if name not in model:
                with pytest.raises(NoSuchViewError):
                    warehouse.load_view(name)
                continue
            warehouse.create_view(name, _sql(m, r), spark=spark,
                                  replace=True)
            vid = max(model[name]["versions"]) + 1
            model[name]["versions"][vid] = (m, r)
            model[name]["current"] = vid
        elif op == "rollback":
            if name not in model:
                continue
            vid = rng.choice(sorted(model[name]["versions"]))
            warehouse.load_view(name).rollback_to_version(vid)
            model[name]["current"] = vid
        elif op == "drop":
            dropped = warehouse.drop_view(name)
            assert dropped == (name in model), ctx
            model.pop(name, None)
        elif op == "query":
            if name not in model:
                continue
            mm, rr = model[name]["versions"][model[name]["current"]]
            got = sqlfacade.execute(
                warehouse, spark, f"SELECT COUNT(*) AS n FROM {name}"
            ).collect()[0].n
            assert got == backing[(mm, rr)], ctx
        elif op == "query_version":
            if name not in model:
                continue
            vid = rng.choice(sorted(model[name]["versions"]))
            mm, rr = model[name]["versions"][vid]
            v = warehouse.load_view(name)
            assert v.to_df(warehouse, spark,
                           version_id=vid).count() == backing[(mm, rr)], ctx
        elif op == "inspect":
            if name not in model:
                continue
            v = warehouse.load_view(name)
            assert sorted(x.version_id for x in v.versions()) == \
                sorted(model[name]["versions"]), ctx
            assert v.metadata.current_version_id == \
                model[name]["current"], ctx

    assert sorted(warehouse.list_views()) == sorted(model), \
        f"seed={seed} final listing diverged"
