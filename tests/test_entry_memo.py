"""Entry-point memo keys survive session restart (VERDICT r4 hygiene item).

``_MENTIONS_CACHE`` / ``_LINKED_CACHE`` key on
``spark.sparkContext.applicationId``, not ``id(spark)``: after ``stop()`` +
rebuild, CPython can hand the new SparkSession the SAME object address, and
an ``id()``-keyed memo would return DataFrames bound to the dead session.
The two-session check runs in a subprocess so it can stop/rebuild sessions
without touching the pytest-shared session fixture.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TWO_SESSION_SCRIPT = """
import json, sys
sys.path.insert(0, "@REPO@")
import __spark_entry__ as e
from runne_contrastive_ner_spark.session import build_session

keys = []
for i in range(2):
    spark = build_session(app_name="memo", master="local[2]", shuffle_partitions=2)
    key = e._session_key(spark)
    # the first session's sentinel must be INVISIBLE through the second
    # session's key
    stale_hit = any(k[0] == key for k in e._MENTIONS_CACHE)
    keys.append([key, stale_hit])
    e._MENTIONS_CACHE[(key, "/fake")] = "sentinel"
    spark.stop()
print(json.dumps(keys))
"""


def test_session_key_reads_application_id():
    import __spark_entry__ as e

    class FakeCtx:
        applicationId = "app-123"

    class FakeSpark:
        sparkContext = FakeCtx()

    assert e._session_key(FakeSpark()) == "app-123"


def test_two_sessions_get_distinct_memo_keys():
    out = subprocess.run(
        [sys.executable, "-c", TWO_SESSION_SCRIPT.replace("@REPO@", REPO)],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    (k0, hit0), (k1, hit1) = payload
    # distinct applicationIds -> the rebuilt session cannot false-hit the
    # dead session's cache entry
    assert k0 != k1
    assert hit0 is False and hit1 is False
