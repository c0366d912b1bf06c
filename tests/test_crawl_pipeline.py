"""End-to-end crawl curation: WARC container → HTML→text documents →
newest-fetch URL dedup → MinHash-LSH duplicate pairs.  Each stage is
unit-tested elsewhere; this asserts the stages actually COMPOSE on one
synthetic crawl, the way a training-data pipeline would run them."""

from sparkdon.pipeline.dedup import routed_minhash_pairs
from sparkdon.sources.warc import (dedup_latest_by_url, read_warc,
                                   warc_bytes, warc_documents)

BODY = ("the quick brown fox jumps over the lazy dog while seventy "
        "distinct tokens of perfectly ordinary prose fill out this "
        "paragraph so that shingling has real material to work with "
        "and the minhash signature is stable across repeated runs")


def _page(rid, url, date, text):
    html = "<html><body><p>" + text + "</p></body></html>"
    return {"warc_type": "response", "target_uri": url,
            "record_id": f"<urn:uuid:{rid}>", "warc_date": date,
            "content_type": "application/http; msgtype=response",
            "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: text/html",
            "payload": html.encode()}


def test_crawl_curation_composes(spark, tmp_path):
    records = [
        # same URL fetched twice (www + tracking variants) — keep newest
        _page("a-old", "http://www.site.com/page?utm_source=x",
              "2024-01-01T00:00:00Z", "stale " + BODY),
        _page("a-new", "http://site.com/page",
              "2024-05-01T00:00:00Z", "fresh " + BODY),
        # exact duplicate content mirrored on two different hosts
        _page("b1", "http://mirror-one.com/doc",
              "2024-02-01T00:00:00Z", BODY),
        _page("b2", "http://mirror-two.com/doc",
              "2024-02-02T00:00:00Z", BODY),
        # unique page + a 404 that must be filtered
        _page("c", "http://unique.com/", "2024-03-01T00:00:00Z",
              "completely different and unrelated content about ships "
              "sailing the northern seas under a pale morning sun with "
              "enough words that its shingles overlap nothing else here"),
        {"warc_type": "response", "target_uri": "http://gone.com/x",
         "record_id": "<urn:uuid:dead>",
         "http_headers": "HTTP/1.1 404 Not Found\r\nContent-Type: text/html",
         "payload": b"<html>gone</html>"},
    ]
    (tmp_path / "crawl-00000.warc.gz").write_bytes(
        warc_bytes(records, gzip_per_record=True))

    docs = dedup_latest_by_url(
        warc_documents(read_warc(spark, str(tmp_path))))
    by_id = {r["doc_id"]: r for r in docs.collect()}
    # 404 dropped; a-old collapsed into a-new by canonical URL
    assert set(by_id) == {"<urn:uuid:a-new>", "<urn:uuid:b1>",
                          "<urn:uuid:b2>", "<urn:uuid:c>"}
    assert by_id["<urn:uuid:a-new>"]["text"].startswith("fresh the quick")

    pairs = {tuple(sorted((r["d1"], r["d2"])))
             for r in routed_minhash_pairs(docs).collect()}
    assert ("<urn:uuid:b1>", "<urn:uuid:b2>") in pairs
    flat = {d for p in pairs for d in p}
    assert "<urn:uuid:c>" not in flat  # unique page pairs with nothing
