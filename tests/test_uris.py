"""URI-resolver parity — the cases come verbatim from the reference's
doctest suite (docs/uri_resolution_examples.rst), which is its executable
specification for this component."""

from sparkdon.uris import UriResolver, local_part, ns_part


def resolver():
    return UriResolver(
        {
            "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
            "dc": "http://purl.org/dc/elements/1.1/",
        },
        "http://dbpedia.org/resource/",
    )


def test_any_to_uri_doctest_cases():
    x = resolver()
    assert x.any_to_uri("Curry") == "http://dbpedia.org/resource/Curry"
    assert x.any_to_uri("<Proton>") == "http://dbpedia.org/resource/Proton"
    assert x.any_to_uri("<..>") == "http://dbpedia.org/"
    assert x.any_to_uri("/ontology/Person") == "http://dbpedia.org/ontology/Person"
    assert x.any_to_uri("http://slashdot.org/") == "http://slashdot.org/"
    assert x.any_to_uri("<http://reddit.com/>") == "http://reddit.com/"
    assert x.any_to_uri("rdfs:Class") == "http://www.w3.org/2000/01/rdf-schema#Class"
    assert x.any_to_uri("dc:title") == "http://purl.org/dc/elements/1.1/title"
    assert x.any_to_uri("dc:Work/title") == "http://purl.org/dc/elements/1.1/Work/title"


def test_humanize_uri_doctest_cases():
    x = resolver()
    assert x.humanize_uri("http://www.w3.org/2000/01/rdf-schema#Class") == "rdfs:Class"
    assert x.humanize_uri("http://purl.org/dc/elements/1.1/title") == "dc:title"
    assert x.humanize_uri("https://tonyortega.org/") == "<https://tonyortega.org/>"
    assert x.humanize_uri("http://dbpedia.org/resource/Fishbone") == "<Fishbone>"


def test_ns_local_parts():
    assert ns_part("http://purl.org/ontology/bibo/AcademicArticle") == "http://purl.org/ontology/bibo/"
    assert local_part("http://purl.org/ontology/bibo/AcademicArticle") == "AcademicArticle"
    assert ns_part("http://www.w3.org/2000/01/rdf-schema#label") == "http://www.w3.org/2000/01/rdf-schema#"
    assert local_part("http://www.w3.org/2000/01/rdf-schema#label") == "label"


def test_is_ok_qname():
    x = resolver()
    assert x.is_ok_qname("http://purl.org/dc/elements/1.1/title")
    assert not x.is_ok_qname("http://example.com/unknown/thing")
    # parens in the local part force absolute rendering
    assert x.is_ok_qname("http://purl.org/dc/elements/1.1/bad(part)") is None
