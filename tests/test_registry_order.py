"""The correctness driver samples the first 50 registered queries —
the registry must keep one representative of every operator family
inside that window (VERDICT r2 item 1)."""

from __future__ import annotations


def test_driver_window_covers_promoted_families():
    from changedatacapture_spark.queries import (
        _DEMOTED,
        _PROMOTED,
        DRIVER_WINDOW,
        ORACLE_SQL,
        SPARK_QUERIES,
    )

    names = list(SPARK_QUERIES)
    assert len(names) == len(set(names))
    first = set(names[:DRIVER_WINDOW])
    assert set(_PROMOTED) <= first
    # demoted variants stay registered AND oracle-paired (check_oracle
    # still verifies them; only the driver sampling window moves)
    for n in _DEMOTED:
        assert n in SPARK_QUERIES and n in ORACLE_SQL
    # every registered query keeps an oracle twin unless deliberately
    # un-oracle-able (none currently)
    assert set(ORACLE_SQL) == set(names)


def test_latest_oracle_log_covers_every_registered_query():
    """The repo rule 'regenerate the full oracle log after registering
    a query' (VERDICT r7 item 3), enforced: a registered query absent
    from the newest committed ORACLE_FULL log fails the suite."""
    import glob
    import os
    import re

    from changedatacapture_spark.queries import SPARK_QUERIES

    root = os.path.join(os.path.dirname(__file__), "..")
    logs = sorted(glob.glob(os.path.join(root, "ORACLE_FULL_r*.txt")))
    assert logs, "no committed full-oracle log"
    text = open(logs[-1]).read()
    passed = set(re.findall(r"^PASS (\S+):", text, re.M))
    missing = [n for n in SPARK_QUERIES if n not in passed]
    assert not missing, (
        f"{os.path.basename(logs[-1])} lacks {missing}: "
        "re-run `python tools/check_oracle.py /root/testdata/sf0.01` "
        "and commit the refreshed log"
    )
