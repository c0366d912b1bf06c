"""Property fuzz for the round-11 crawl-index contracts.

Two invariants that must hold on ANY input, not just the fixtures:

1. SURT parity: the Python builder key :func:`surt` and the JVM query
   expression :func:`surt_key` agree byte-for-byte (build_cdx keys
   records with the former; prefix filters compile with the latter —
   a divergence silently drops records from fetches).
2. Split-range tiling: :func:`_scan_split_ranges` spans tile each WARC
   file contiguously from offset 0, and parsing the spans' bytes
   yields exactly the whole-file parse (record ids, in order).

Hypothesis generates the URLs; the WARC side uses seeded random record
shapes (hypothesis around a Spark action would shrink forever, so the
Spark-free invariant #2 gets the generative treatment and SURT's JVM
half is checked on one batched dataframe pass).
"""

from __future__ import annotations

import random
import string

from hypothesis import given, settings, strategies as st

from sparkdon.sources.cdx import surt
from sparkdon.sources.warc import (_scan_split_ranges, parse_warc_records,
                                   warc_bytes)

_LABEL = st.text(alphabet=string.ascii_letters + string.digits + "-",
                 min_size=1, max_size=8)
_PATH_CHARS = string.ascii_letters + string.digits + "/?#=&%~._- :@"


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http://", "https://", "ftp://", ""]))
    user = draw(st.sampled_from(["", "user@", "a:b@"]))
    host = ".".join(draw(st.lists(_LABEL, min_size=1, max_size=4)))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(st.text(alphabet=_PATH_CHARS, max_size=30))
    if path and not path[0] in "/?#":
        path = "/" + path
    return f"{scheme}{user}{host}{port}{path}"


@given(st.lists(urls(), min_size=1, max_size=60, unique=True))
@settings(max_examples=20, deadline=None)
def test_surt_is_cdxj_safe_and_deterministic(batch):
    for u in batch:
        k = surt(u)
        assert " " not in k            # one CDXJ field, always
        assert ")" in k
        assert k == surt(u)            # pure


def test_surt_jvm_twin_parity_on_fuzz_battery(spark):
    # one deterministic hypothesis-style battery through the JVM twin
    # (a dataframe action per hypothesis example would take minutes)
    rng = random.Random(20260815)
    batch = []
    for _ in range(300):
        scheme = rng.choice(["http://", "https://", "ftp://", ""])
        user = rng.choice(["", "user@", "a:b@"])
        host = ".".join(
            "".join(rng.choices(string.ascii_letters + string.digits, k=rng.randint(1, 6)))
            for _ in range(rng.randint(1, 4)))
        port = rng.choice(["", ":80", ":443", ":8080"])
        n = rng.randint(0, 25)
        path = "".join(rng.choices(_PATH_CHARS, k=n))
        if path and path[0] not in "/?#":
            path = "/" + path
        batch.append(f"{scheme}{user}{host}{port}{path}")
    from sparkdon.sources.cdx import surt_key

    df = spark.createDataFrame([(u,) for u in batch], "url string")
    got = [r[0] for r in df.select(surt_key("url")).collect()]
    want = [surt(u) for u in batch]
    assert got == want


def _random_records(rng, n):
    recs = []
    for i in range(n):
        recs.append({
            "warc_type": rng.choice(["resource", "response", "metadata"]),
            "target_uri": f"http://f{rng.randint(0, 5)}.io/{i}",
            "record_id": f"<urn:uuid:f-{i}>",
            "content_type": "text/plain",
            "payload": bytes(rng.getrandbits(8)
                             for _ in range(rng.randint(0, 400))),
        })
    return recs


def test_split_ranges_tile_and_parse_equal_whole_file():
    rng = random.Random(7)
    for case in range(12):
        gz = case % 2 == 0
        data = warc_bytes(_random_records(rng, rng.randint(1, 40)),
                          gzip_per_record=gz)
        for target in (1, 64, 1024, len(data) + 1):
            spans = list(_scan_split_ranges(data, target))
            assert spans, (case, target)
            assert spans[0][0] == 0
            for (o1, l1, _m1), (o2, _l2, _m2) in zip(spans, spans[1:]):
                assert o1 + l1 == o2            # contiguous tiling
            whole = [r["record_id"] for r in parse_warc_records(data)]
            via_spans = [r["record_id"]
                         for (o, ln, _m) in spans
                         for r in parse_warc_records(data[o:o + ln])]
            assert via_spans == whole, (case, target)
