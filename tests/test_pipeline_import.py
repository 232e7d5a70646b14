"""End-to-end import pipeline (§3.1): control triples → scheduled tasks →
page enumeration → extraction → triage → partitioned TTL writes + status
updates, as one set-oriented job."""

import os

from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.plans.pipeline_import import (
    ADMS_STATUS,
    TASK_HAS_FILE,
    TASK_INPUT_CONTAINER,
    TASK_OPERATION,
    run_import_pipeline,
)
from harvesting_extract_to_ttl_service_spark.schema import (
    EXTRACTING_OPERATION,
    RDF_TYPE,
    STATUS_SCHEDULED,
    STATUS_SUCCESS,
    TASK_TYPE,
    TRIPLE_SCHEMA,
)

G = "urn:g:jobs"


def _control(spark):
    def t(s, p, o, ot="iri"):
        return (s, p, o, ot, None, None, G)

    rows = [
        # task 1: scheduled, extracting, container c1 with two pages
        t("urn:task:1", RDF_TYPE, TASK_TYPE),
        t("urn:task:1", ADMS_STATUS, STATUS_SCHEDULED),
        t("urn:task:1", TASK_OPERATION, EXTRACTING_OPERATION),
        t("urn:task:1", TASK_INPUT_CONTAINER, "urn:container:1"),
        t("urn:container:1", TASK_HAS_FILE, "share://p1.html"),
        t("urn:container:1", TASK_HAS_FILE, "share://p2.html"),
        # task 2: scheduled but wrong operation → filtered out
        t("urn:task:2", RDF_TYPE, TASK_TYPE),
        t("urn:task:2", ADMS_STATUS, STATUS_SCHEDULED),
        t("urn:task:2", TASK_OPERATION, "urn:op:other"),
        t("urn:task:2", TASK_INPUT_CONTAINER, "urn:container:2"),
        t("urn:container:2", TASK_HAS_FILE, "share://p3.html"),
        # task 3: right operation but already success → filtered out
        t("urn:task:3", RDF_TYPE, TASK_TYPE),
        t("urn:task:3", ADMS_STATUS, STATUS_SUCCESS),
        t("urn:task:3", TASK_OPERATION, EXTRACTING_OPERATION),
        t("urn:task:3", TASK_INPUT_CONTAINER, "urn:container:3"),
    ]
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def _bodies(spark):
    ok = ('<div about="http://ex/d1">'
          '<span property="dct:title">T1</span>'
          '<span property="dct:date" content="2024/1/2" datatype="xsd:date">x</span>'
          "</div>")
    return spark.createDataFrame(
        [("share://p1.html", "http://ex/page/1", ok),
         ("share://p2.html", "http://ex/page/2", None),  # extraction error
         ("share://p3.html", "http://ex/page/3", ok)],
        "page_uri string, url string, html string")


def test_run_import_pipeline(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    res = run_import_pipeline(_control(spark), _bodies(spark),
                              out_dir=out_dir, graph=G,
                              write_debug_ttls=True, now_iso="t1")

    # only task 1 qualifies (scheduled + valid operation)
    assert [r.task_uri for r in res["tasks"].collect()] == ["urn:task:1"]
    assert {r.page_uri for r in res["task_pages"].collect()} == {
        "share://p1.html", "share://p2.html"}

    # page 2 failed extraction → error row, page-local
    errs = res["errors"].collect()
    assert len(errs) == 1 and errs[0].page_uri == "share://p2.html"

    valid = res["valid"]
    vals = {(r.subject, r.predicate, r.object_value) for r in valid.collect()}
    # date repaired to canonical form; provenance attached
    assert ("http://ex/d1", "http://purl.org/dc/terms/date", "2024-01-02") in vals
    assert ("http://ex/d1", "http://www.w3.org/ns/prov#wasDerivedFrom",
            "http://ex/page/1") in vals
    # corrected = original (broken) form of the repaired triple
    corr = {(r.object_value,) for r in res["corrected"].collect()}
    assert ("2024/1/2",) in corr

    # status: busy then success for the processed task
    assert [(r.task_uri, r.status) for r in res["status_updates"].collect()] \
        == [("urn:task:1", STATUS_SUCCESS)]
    assert res["busy_updates"].first().status.endswith("/busy")

    # partitioned writes: valid + 3 debug trees, keyed by task/page
    for sub in ("valid", "original", "invalid", "corrected"):
        assert os.path.isdir(f"{out_dir}/{sub}"), sub
    page_dirs = os.listdir(
        f"{out_dir}/valid/task_uri=urn%3Atask%3A1"
        if os.path.isdir(f"{out_dir}/valid/task_uri=urn%3Atask%3A1")
        else f"{out_dir}/valid/" + os.listdir(f"{out_dir}/valid")[0])
    assert any("page_uri=" in d for d in page_dirs)


def test_error_entity_triples(spark):
    """A failing page renders the reference's appendTaskError block
    (lib/task.js:189-206): typed oslc:Error resource with mu:uuid and
    oslc:message, linked from the task via task:error; with
    fail_on_page_error the affected task flips to failed."""
    from harvesting_extract_to_ttl_service_spark.schema import (
        ERROR_TYPE,
        ERROR_URI_PREFIX,
        MU_UUID,
        OSLC_MESSAGE,
        RDF_TYPE,
        STATUS_FAILED,
        TASK_ERROR,
    )

    res = run_import_pipeline(_control(spark), _bodies(spark), graph=G,
                              fail_on_page_error=True)
    triples = {(r.subject, r.predicate, r.object_value, r.object_type)
               for r in res["error_triples"].collect()}
    # exactly one failing page (p2, null body) → one error resource
    uris = {s for s, p, o, t in triples if p == RDF_TYPE}
    assert len(uris) == 1
    [uri] = uris
    assert uri.startswith(ERROR_URI_PREFIX)
    err_id = uri[len(ERROR_URI_PREFIX):]
    assert (uri, RDF_TYPE, ERROR_TYPE, "iri") in triples
    assert (uri, MU_UUID, err_id, "literal") in triples
    assert (uri, OSLC_MESSAGE, "ValueError: null html body",
            "literal") in triples
    assert ("urn:task:1", TASK_ERROR, uri, "iri") in triples
    assert {r.graph for r in res["error_triples"].collect()} == {G}
    # the (only) task carries a failing page → failed status
    assert [(r.task_uri, r.status) for r in res["status_updates"].collect()] \
        == [("urn:task:1", STATUS_FAILED)]
    # default policy (reference semantics): page errors do not fail tasks
    res2 = run_import_pipeline(_control(spark), _bodies(spark), graph=G)
    assert res2["status_updates"].first().status == STATUS_SUCCESS


def test_shared_page_extracts_once_per_task(spark):
    """A page_uri in two tasks' containers must yield each triple exactly
    once per task (extraction runs on distinct pages, then fans out) —
    not once per (task, page) row cross-multiplied by the re-join."""
    def t(s, p, o):
        return (s, p, o, "iri", None, None, G)

    rows = []
    for k in ("1", "2"):
        rows += [
            t(f"urn:task:{k}", RDF_TYPE, TASK_TYPE),
            t(f"urn:task:{k}", ADMS_STATUS, STATUS_SCHEDULED),
            t(f"urn:task:{k}", TASK_OPERATION, EXTRACTING_OPERATION),
            t(f"urn:task:{k}", TASK_INPUT_CONTAINER, f"urn:container:{k}"),
            t(f"urn:container:{k}", TASK_HAS_FILE, "share://shared.html"),
        ]
    control = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    bodies = spark.createDataFrame(
        [("share://shared.html", "http://ex/page/s",
          '<div about="http://ex/d1">'
          '<span property="dct:title">T1</span></div>')],
        "page_uri string, url string, html string")

    res = run_import_pipeline(control, bodies, graph=G)
    valid = res["valid"].collect()
    per_task = {}
    for r in valid:
        per_task.setdefault(r.task_uri, []).append(
            (r.subject, r.predicate, r.object_value))
    assert set(per_task) == {"urn:task:1", "urn:task:2"}
    for task_uri, triples in per_task.items():
        assert len(triples) == len(set(triples)), \
            f"duplicated triples within {task_uri}: {sorted(triples)}"
        # title + provenance
        assert len(set(triples)) == 2


def test_pipeline_compat_mode_js_date_output_parity(spark, tmp_path):
    """compat=True end-to-end: a repaired date/dateTime page run through
    the full pipeline writes TTL whose literal bytes match the
    reference's JS-Date re-emission (month zero-padded, day/hour/minute/
    second NOT — fixTriple.js:152-156,201-208), demonstrating byte-level
    output parity on the repaired forms."""
    body = ('<div about="http://ex/d1">'
            '<span property="dct:date" content="2024/1/2"'
            ' datatype="xsd:date">x</span>'
            '<span property="dct:created" content="2024/1/2 9:5:3"'
            ' datatype="xsd:dateTime">y</span>'
            "</div>")
    control = _control(spark)
    bodies = spark.createDataFrame(
        [("share://p1.html", "http://ex/page/1", body),
         ("share://p2.html", "http://ex/page/2", body)],
        "page_uri string, url string, html string")
    out_dir = str(tmp_path / "out")
    res = run_import_pipeline(control, bodies, out_dir=out_dir, graph=G,
                              compat=True)
    vals = {(r.predicate, r.object_value) for r in res["valid"].collect()}
    assert ("http://purl.org/dc/terms/date", "2024-01-2") in vals
    assert ("http://purl.org/dc/terms/created", "2024-01-2T9:5:3") in vals

    # byte-level check on the serialized N-Triples output
    written = []
    for root, _dirs, files in os.walk(f"{out_dir}/valid"):
        for fn in files:
            if not fn.startswith("."):
                with open(os.path.join(root, fn)) as f:
                    written.append(f.read())
    text = "\n".join(written)
    assert ('<http://ex/d1> <http://purl.org/dc/terms/date> "2024-01-2"'
            "^^<http://www.w3.org/2001/XMLSchema#date> ." in text)
    assert ('<http://ex/d1> <http://purl.org/dc/terms/created> '
            '"2024-01-2T9:5:3"'
            "^^<http://www.w3.org/2001/XMLSchema#dateTime> ." in text)


def test_file_metadata_roundtrip_resolves_page_bodies(spark, tmp_path):
    """The getFileContent composition (file-helpers.js:20-63) end to end:
    page bodies are NOT pre-joined — they resolve from the metadata
    triples (physical →nie:dataSource→ logical, logical →nie:url→ web
    address) plus the share directory, then feed the import pipeline."""
    import gzip

    from harvesting_extract_to_ttl_service_spark.sources.files import (
        read_share_files,
        resolve_page_bodies,
    )

    share = tmp_path / "share"
    share.mkdir()
    body = ('<div about="http://ex/d1">'
            '<span property="dct:title">T1</span></div>')
    (share / "f1.html").write_text(body)
    with gzip.open(share / "f2.html.gz", "wt") as f:
        f.write('<div about="http://ex/d2">'
                '<span property="dct:title">T2</span></div>')

    NIE = "http://www.semanticdesktop.org/ontologies/2007/01/19/nie#"
    meta_rows = [
        ("share://f1.html", NIE + "dataSource", "share://p1.html",
         "iri", None, None, G),
        ("share://f2.html.gz", NIE + "dataSource", "share://p2.html",
         "iri", None, None, G),
        ("share://p1.html", NIE + "url", "http://ex/page/1",
         "iri", None, None, G),
        ("share://p2.html", NIE + "url", "http://ex/page/2",
         "iri", None, None, G),
    ]
    from harvesting_extract_to_ttl_service_spark.schema import TRIPLE_SCHEMA
    metadata = spark.createDataFrame(meta_rows, TRIPLE_SCHEMA)

    contents = read_share_files(spark, str(share))
    assert {r.physical_uri for r in contents.collect()} == {
        "share://f1.html", "share://f2.html.gz"}

    bodies = resolve_page_bodies(metadata, contents, graph=G)
    got = {(r.page_uri, r.url) for r in bodies.collect()}
    assert got == {("share://p1.html", "http://ex/page/1"),
                   ("share://p2.html", "http://ex/page/2")}

    res = run_import_pipeline(_control(spark).unionByName(metadata),
                              bodies, graph=G)
    vals = {(r.subject, r.predicate, r.object_value)
            for r in res["valid"].collect()}
    # p1/p2 are task 1's pages; d1 extracted with nie:url provenance
    assert ("http://ex/d1", "http://purl.org/dc/terms/title", "T1") in vals
    assert ("http://ex/d1", "http://www.w3.org/ns/prov#wasDerivedFrom",
            "http://ex/page/1") in vals
    assert ("http://ex/d2", "http://www.w3.org/ns/prov#wasDerivedFrom",
            "http://ex/page/2") in vals
    assert res["errors"].count() == 0


def test_spilled_content_written_and_registered(spark, tmp_path):
    """A page with oversized decision HTML must (a) write the content to
    the share-layout tree under its content-addressed file uri and
    (b) produce the writeFileToTriplestore metadata block
    (file-helpers.js:103-148) with the pipeline's deterministic stamp."""
    body = ('<div about="http://ex/d1">'
            '<div property="prov:value" datatype="rdf:HTML">'
            "<p>Full decision</p></div></div>")
    bodies = spark.createDataFrame(
        [("share://p1.html", "http://ex/page/1", body),
         ("share://p2.html", "http://ex/page/2",
          '<div about="http://ex/d2"><span property="dct:title">t</span></div>')],
        "page_uri string, url string, html string")
    out_dir = str(tmp_path / "out")
    res = run_import_pipeline(_control(spark), bodies, out_dir=out_dir,
                              graph=G, now_iso="2024-01-02T03:04:05Z")

    [spill] = res["spilled"].collect()
    assert "<p>Full decision</p>" in spill.content
    # content landed under its file_uri partition
    import urllib.parse
    part = f"file_uri={urllib.parse.quote(spill.file_uri, safe='')}"
    content_dir = os.path.join(out_dir, "content", part)
    assert os.path.isdir(content_dir), os.listdir(f"{out_dir}/content")
    text = ""
    for fn in os.listdir(content_dir):
        if not fn.startswith("."):
            with open(os.path.join(content_dir, fn)) as f:
                text += f.read()
    assert "<p>Full decision</p>" in text

    md = {(r.subject, r.predicate, r.object_value)
          for r in res["spilled_metadata"].collect()}
    NFO = "http://www.semanticdesktop.org/ontologies/2007/03/22/nfo#"
    NIE = "http://www.semanticdesktop.org/ontologies/2007/01/19/nie#"
    assert (spill.file_uri, NFO + "fileName", "content.html") in md
    assert (spill.file_uri, "http://purl.org/dc/terms/created",
            "2024-01-02T03:04:05Z") in md
    phys = [o for s, p, o in md if p == NIE + "dataSource"]
    assert phys == [spill.file_uri]
    assert res["spilled_metadata"].count() == 8


def test_write_ttl_dynamic_overwrite_preserves_other_partitions(spark, tmp_path):
    """Two sequential writes with different task partitions (the service's
    batch-after-batch shape) must BOTH be on disk afterwards; a replay of
    the same partition replaces only itself."""
    from harvesting_extract_to_ttl_service_spark.schema import TRIPLE_SCHEMA
    from harvesting_extract_to_ttl_service_spark.sources.files import write_ttl

    out = str(tmp_path / "ttl")

    def batch(task, title):
        rows = [("http://ex/d", "http://p", title, "literal",
                 None, None, None)]
        df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
        return df.withColumn("task_uri", F.lit(task))

    write_ttl(batch("urn:task:1", "A"), out, ("task_uri",))
    write_ttl(batch("urn:task:2", "B"), out, ("task_uri",))
    dirs = {d for d in os.listdir(out) if d.startswith("task_uri=")}
    assert len(dirs) == 2, dirs

    # replay of task 1 with new content replaces ONLY its partition
    write_ttl(batch("urn:task:1", "A2"), out, ("task_uri",))
    dirs2 = {d for d in os.listdir(out) if d.startswith("task_uri=")}
    assert dirs2 == dirs
    [t1] = [d for d in dirs2 if "1" in d.split("=")[1]]
    text = ""
    for root, _d, files in os.walk(os.path.join(out, t1)):
        for fn in files:
            if not fn.startswith("."):
                with open(os.path.join(root, fn)) as f:
                    text += f.read()
    assert '"A2"' in text and '"A"' not in text.replace('"A2"', "")


def test_pipeline_no_matching_tasks(spark):
    control = _control(spark).filter(F.col("subject") != "urn:task:1")
    res = run_import_pipeline(control, _bodies(spark))
    assert res["tasks"].count() == 0
    assert res["valid"].count() == 0
    assert res["status_updates"].count() == 0


def test_read_share_files_decodes_encoded_filenames(spark, tmp_path):
    """input_file_name() returns a percent-encoded URI; share files whose
    names carry spaces, '+', or non-ASCII must still surface with their
    PLAIN share:// uris or they silently miss the nie:dataSource join."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        read_share_files,
    )

    share = tmp_path / "share"
    share.mkdir()
    names = ["with space.html", "plus+sign.html", "café.html"]
    for n in names:
        (share / n).write_text("<p>x</p>")
    got = {r.physical_uri for r in read_share_files(spark, str(share)).collect()}
    assert got == {f"share://{n}" for n in names}


def test_pipeline_outputs_build_lazily(spark):
    """Accessing one output must not construct (analyze) the others —
    the planning-cost contract behind PipelineOutputs: a foreachBatch
    consumer executing only `valid` pays only the valid subtree's
    analysis. Construction is cached: same object on repeat access."""
    res = run_import_pipeline(_control(spark), _bodies(spark))
    assert not res._cache
    v = res["valid"]
    assert set(res._cache) == {"valid"}
    assert res["valid"] is v
    assert set(res) == {
        "tasks", "task_pages", "valid", "invalid", "corrected", "spilled",
        "spilled_metadata", "errors", "error_triples", "busy_updates",
        "status_updates"}
