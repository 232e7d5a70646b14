"""The composed import pipeline — the reference's ``runImportPipeline``
(/root/reference/lib/pipeline-import.js:22-122) as ONE set-oriented Spark
job over all tasks at once.

Reference trace (SURVEY.md §3.1) → engine step:
  1  load scheduled tasks (4 SPARQL SELECTs, lib/task.js:80-156)
     → one ``star_join`` pivot over the control triples
  2  status → busy (lib/pipeline-import.js:33)
     → a status-update DataFrame (busy rows) the caller upserts
  3  page enumeration (COUNT + LIMIT/OFFSET loop, lines 124-178)
     → one task⋈container⋈hasFile join, no pagination
  4  per-page read/extract/triage (lines 44-107, sequential loop)
     → pages joined to bodies, Arrow-batched extraction, column triage;
       a page that fails to parse yields an error row, not a loop break
  5  write valid(.+debug) TTLs + register files (lines 75-106)
     → partitioned N-Triples writes keyed by (task, page)
  6  status → success (line 109)
     → success rows in the returned status updates (a task with zero
       successfully-extracted pages still succeeds, as in the reference,
       where per-page failures only ``continue``)

Everything returned is a DataFrame; nothing iterates per task or per page
on the driver. At 100 TB: tasks/pages are control-plane-sized (broadcast),
documents dominate and stream through the extract stage partition-wise.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.extract import (
    extract_pages,
    spill_html_content,
)
from harvesting_extract_to_ttl_service_spark.operators.materialize import (
    codegen_barrier,
    materialize,
)
from harvesting_extract_to_ttl_service_spark.operators.relational import (
    graph_scope,
    star_join,
    values_filter,
)
from harvesting_extract_to_ttl_service_spark.operators.triage import (
    corrected_triples,
    invalid_triples,
    triage,
    valid_triples,
)
from harvesting_extract_to_ttl_service_spark.schema import (
    ADMS,
    ERROR_TYPE,
    ERROR_URI_PREFIX,
    EXTRACTING_OPERATION,
    IMPORTING_OPERATION,
    MU_UUID,
    OSLC_MESSAGE,
    RDF_TYPE,
    STATUS_BUSY,
    STATUS_FAILED,
    STATUS_SCHEDULED,
    STATUS_SUCCESS,
    TASK,
    TASK_ERROR,
    TASK_TYPE,
)
from harvesting_extract_to_ttl_service_spark.sources.files import (
    spilled_file_metadata,
    write_spilled_content,
    write_ttl,
)

ADMS_STATUS = ADMS + "status"
TASK_OPERATION = TASK + "operation"
TASK_INPUT_CONTAINER = TASK + "inputContainer"
TASK_HAS_FILE = TASK + "hasFile"


def load_scheduled_tasks(control: DataFrame,
                         graph: str | None = None) -> DataFrame:
    """Step 1: the task-load star (lib/task.js:83-100) + the scheduled /
    operation filters the reference applies before running a task
    (lib/pipeline-import.js:30, lib/task.js:94-97). One pivot — not one
    query per pattern."""
    tasks = star_join(
        control,
        {"task_type": RDF_TYPE, "status": ADMS_STATUS,
         "operation": TASK_OPERATION, "input_container": TASK_INPUT_CONTAINER},
        required=["task_type", "status", "operation", "input_container"],
        graph=graph,
    ).withColumnRenamed("subject", "task_uri")
    tasks = tasks.filter(F.col("task_type") == TASK_TYPE)
    tasks = tasks.filter(F.col("status") == STATUS_SCHEDULED)
    return values_filter(tasks, "operation",
                         [IMPORTING_OPERATION, EXTRACTING_OPERATION])


def enumerate_pages(tasks: DataFrame, control: DataFrame,
                    graph: str | None = None) -> DataFrame:
    """Step 3: ``task task:inputContainer ?c . ?c task:hasFile ?page``
    (lib/pipeline-import.js:129-139) for ALL tasks in one join; DISTINCT
    replaces the reference's Set-dedup across LIMIT/OFFSET windows."""
    has_file = (
        graph_scope(control, graph)
        .filter(F.col("predicate") == TASK_HAS_FILE)
        .select(F.col("subject").alias("input_container"),
                F.col("object_value").alias("page_uri"))
    )
    return (
        tasks.select("task_uri", "input_container")
        .join(has_file, "input_container")
        .select("task_uri", "page_uri")
        .distinct()
    )


def render_task_errors(errors: DataFrame, graph: str | None = None) -> DataFrame:
    """Render error rows to the reference's ``appendTaskError`` triple
    block (/root/reference/lib/task.js:189-206): an error resource typed
    oslc:Error with mu:uuid + oslc:message, linked from the task via
    task:error. The reference mints a random uuid per error; ids here are
    content-derived (md5 of task|page|message — SURVEY.md §7 hard part d)
    so re-runs and both engines of a parity check agree.

    Divergence note: the reference only writes this block for TASK-level
    exceptions (page-level extract failures just ``continue``,
    lib/pipeline-import.js:66-70); the engine generalizes it to the
    per-page error rows its set-oriented run produces — strictly more
    diagnostic surface, same vocabulary."""
    e = errors.select(
        "task_uri",
        F.md5(F.concat_ws("|", "task_uri", "page_uri", "error")).alias("_id"),
        F.col("error").alias("_msg"),
    )
    uri = F.concat(F.lit(ERROR_URI_PREFIX), F.col("_id"))

    def triple(s, p, o, object_type="iri"):
        return F.struct(
            s.alias("subject"), F.lit(p).alias("predicate"),
            o.alias("object_value"), F.lit(object_type).alias("object_type"),
            F.lit(None).cast("string").alias("datatype"),
            F.lit(None).cast("string").alias("language"),
            F.lit(graph).cast("string").alias("graph"))

    # One explode over a 4-struct array, NOT a 4-way union: each union
    # branch carries its own copy of the upstream errors subtree — which
    # contains the Python extraction stage — so the union shape executes
    # the extraction once per branch in the same job.
    return e.select(F.explode(F.array(
        triple(uri, RDF_TYPE, F.lit(ERROR_TYPE)),
        triple(uri, MU_UUID, F.col("_id"), "literal"),
        triple(uri, OSLC_MESSAGE, F.col("_msg"), "literal"),
        triple(F.col("task_uri"), TASK_ERROR, uri),
    )).alias("t")).select("t.*")


class PipelineOutputs(Mapping):
    """Lazy output map for :func:`run_import_pipeline`: each DataFrame is
    CONSTRUCTED (triggering Catalyst analysis of its whole subtree) only
    on first access, then cached.

    Why it matters: building a DataFrame is not free — analysis walks the
    full logical tree, and the pipeline's outputs each embed the
    extraction+triage trunk. Eagerly constructing all 11 outputs cost
    ~1.8 s of driver time per call (measured at sf0.1) even when the
    caller — a per-micro-batch `foreachBatch`, or the e2e catalog entry —
    executes only `valid`. Keys and `res["name"]` access are unchanged
    from the previous plain-dict return."""

    def __init__(self, builders: dict[str, Callable[[], DataFrame]]):
        self._builders = builders
        self._cache: dict[str, DataFrame] = {}

    def __getitem__(self, key: str) -> DataFrame:
        if key not in self._cache:
            self._cache[key] = self._builders[key]()
        return self._cache[key]

    def __iter__(self) -> Iterator[str]:
        return iter(self._builders)

    def __len__(self) -> int:
        return len(self._builders)


def _memo(fn: Callable[[], DataFrame]) -> Callable[[], DataFrame]:
    cell: list[DataFrame] = []

    def get() -> DataFrame:
        if not cell:
            cell.append(fn())
        return cell[0]

    return get


def run_import_pipeline(control: DataFrame, page_bodies: DataFrame,
                        out_dir: str | None = None,
                        graph: str | None = None,
                        write_debug_ttls: bool = False,
                        now_iso: str = "1970-01-01T00:00:00Z",
                        fail_on_page_error: bool = False,
                        compat: bool = False,
                        compat_tz: str | None = None,
                        task_filter: DataFrame | None = None,
                        materialize_mode: str = "local_checkpoint",
                        ) -> PipelineOutputs:
    """The whole §3.1 flow. ``control`` is the task/job triple set;
    ``page_bodies`` maps page_uri → (url, html). Returns every output as a
    DataFrame; when ``out_dir`` is set, also writes the
    valid(/original/invalid/corrected) N-Triples trees partitioned by
    (task, page) — 4 files per page only in debug mode, matching
    WRITE_DEBUG_TTLS (constants.js:37-38, lib/pipeline-import.js:75-106).

    ``compat=True`` threads the triage compat flag end-to-end: repaired
    date/dateTime literals re-emit in the reference's non-padded JS-Date
    form (``2023-05-7T9:5:3``, fixTriple.js:152-156,201-208) instead of
    the canonical zero-padded default, giving byte-identical TTL output
    parity with the reference service. ``compat_tz`` names the reference
    deployment's zone for zone-carrying repairs (naive-UTC when None —
    parity with a TZ=UTC reference; see operators/triage.py).

    ``task_filter`` (a one-column ``task_uri`` DataFrame) restricts the
    run to those tasks — the streaming front door passes each
    micro-batch's scheduled-task set here, mirroring the reference's
    per-entry ``runImportPipeline(entry)`` calls (app.js:35-38) as ONE
    set-oriented job per batch. Control-plane sized → broadcast."""
    tasks = load_scheduled_tasks(control, graph)
    if task_filter is not None:
        tasks = tasks.join(F.broadcast(task_filter.select("task_uri")),
                           "task_uri", "left_semi")
    task_pages = enumerate_pages(tasks, control, graph)

    # Extract each page ONCE even when several tasks share it: the
    # extraction output is keyed by page_uri only, so extracting per
    # (task, page) row would both re-parse the page per task and
    # cross-multiply every triple at the task_pages re-join below.
    pages = (
        task_pages.select("page_uri").distinct()
        .join(page_bodies.select("page_uri", "url", "html"), "page_uri")
    )
    # Inlined extraction_pipeline so the raw extract output can be
    # persisted across the multi-sink write block below: with out_dir set
    # there are 2 (or 5, in debug mode) independent write actions, and
    # without a persist each one would re-run the Python extraction stage.
    # Storage is MEMORY_AND_DISK and scoped to this call — per micro-batch
    # in the service, bounded by the batch's page fan-out, spilled to disk
    # past executor memory.
    raw = extract_pages(pages, with_provenance=True)
    persisted = None
    if out_dir is not None:
        from pyspark import StorageLevel

        persisted = raw.persist(StorageLevel.MEMORY_AND_DISK)
    extracted, spilled = spill_html_content(raw)
    # fan results out to tasks: extraction keys rows by page_uri
    extracted = extracted.join(
        F.broadcast(task_pages), "page_uri").withColumn(
        "graph", F.lit(graph).cast("string"))

    # Lazy cut on the (small) error rows: the error-triple block and the
    # fail_on_page_error status branch BOTH consume them, and each union
    # branch would otherwise carry its own copy of the extraction subtree
    # (see SCALE.md duplicate-subtree audit). eager semantics → callers
    # that never execute an error output pay nothing; ``materialize_mode``
    # picks the cut's fault-tolerance strategy (operators/materialize.py —
    # pass 'persist' or 'checkpoint' on clusters with preemptible
    # executors, where a localCheckpoint block loss fails the job).
    errors = _memo(lambda: materialize(
        extracted.filter(F.col("error").isNotNull())
        .select("task_uri", "page_uri", "error"),
        materialize_mode))
    # codegen_barrier: the triage chains fused with the valid-projection's
    # re-inlined copies overflow Janino's 64 KB method limit and drop the
    # whole stage to interpreted eval (operators/materialize.py) — split
    # the codegen unit here so both halves compile.
    triaged = _memo(lambda: codegen_barrier(triage(
        extracted.filter(F.col("error").isNull()),
        compat=compat, compat_tz=compat_tz), "triage"))

    # valid/invalid/corrected keep the (task, page) keys for partitioning
    keys = ("task_uri", "page_uri")

    # Reference semantics: per-page extract failures `continue` and the
    # task still succeeds (lib/pipeline-import.js:66-70,109); only with
    # fail_on_page_error=True does any error row fail its task (the
    # task-level catch path, lines 111-115, mapped onto page granularity).
    def status_updates() -> DataFrame:
        s = (tasks.select("task_uri")
             .withColumn("status", F.lit(STATUS_SUCCESS))
             .withColumn("modified", F.lit(now_iso)))
        if fail_on_page_error:
            failed = errors().select("task_uri").distinct().withColumn(
                "_failed", F.lit(True))
            s = (s.join(failed, "task_uri", "left")
                 .withColumn("status", F.when(F.col("_failed"),
                                              F.lit(STATUS_FAILED))
                             .otherwise(F.col("status")))
                 .drop("_failed"))
        return s

    # Outputs build lazily (PipelineOutputs): constructing all of them
    # eagerly re-analyzed the extraction+triage trunk once per output —
    # ~1.8 s of driver time per call at sf0.1 — while a typical consumer
    # (foreachBatch, the e2e entry) executes only one or two.
    outputs = PipelineOutputs({
        "tasks": lambda: tasks,
        "task_pages": lambda: task_pages,
        "valid": lambda: valid_triples(triaged(), extra_cols=keys),
        "invalid": lambda: invalid_triples(triaged(), extra_cols=keys),
        "corrected": lambda: corrected_triples(triaged(), extra_cols=keys),
        "spilled": lambda: spilled,
        # the reference's writeFileToTriplestore pairing: spilled content
        # gets a share-layout write AND a metadata-registration block
        "spilled_metadata": lambda: spilled_file_metadata(
            spilled, now_iso, graph),
        "errors": errors,
        "error_triples": lambda: render_task_errors(errors(), graph),
        "busy_updates": lambda: (tasks.select("task_uri")
                                 .withColumn("status", F.lit(STATUS_BUSY))
                                 .withColumn("modified", F.lit(now_iso))),
        "status_updates": status_updates,
    })

    if out_dir is not None:
        try:
            write_ttl(outputs["valid"], f"{out_dir}/valid", keys)
            write_spilled_content(spilled, f"{out_dir}/content")
            if write_debug_ttls:
                original = triaged().select(
                    *keys, "subject", "predicate", "object_value",
                    "object_type", "datatype", "language", "graph")
                write_ttl(original, f"{out_dir}/original", keys)
                write_ttl(outputs["invalid"], f"{out_dir}/invalid", keys)
                write_ttl(outputs["corrected"], f"{out_dir}/corrected", keys)
        finally:
            # the returned DataFrames stay valid — they just recompute if
            # executed after this point (the writes were the hot path)
            if persisted is not None:
                persisted.unpersist()

    return outputs
