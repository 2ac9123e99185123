"""WebDataset tar shard reader — a Spark 4 Python DataSource.

The reference scans tar shards with generator chains
(``tariterators.py:97-246``: ``tar_file_iterator`` → ``tar_file_expander``
→ ``group_by_keys``). Here the same semantics are a first-class Spark
datasource: ``spark.read.format("webdataset").load(paths)`` yields one row
per *sample* with schema

    __key__ string, __url__ string, __member_idx__ bigint,
    sample map<string, binary>

Design for scale:
- One input partition per shard file → Spark schedules shards across
  executors exactly like the reference's shard striping
  (``split_by_node``/``split_by_worker``, shardlists.py:115-142), but
  elastically and with retry.
- Streaming tar read (mode ``r|``) — memory is bounded by one member, not
  one shard, matching the reference's ``stream.members = []`` release
  (tariterators.py:135).
- Member-level pushdown: ``select_files``/``rename_files`` predicates run
  *before* member bytes are materialized (tariterators.py:101-131) — the
  tar-format analog of parquet column pruning.
- Dynamic columns ride a ``map<string,binary>`` (samples are ragged —
  SURVEY.md §7 "What's hard" (1)); :func:`decode_columns` promotes typed
  columns Catalyst can prune/push, mirroring ``autodecode`` suffix dispatch
  (autodecode.py:145-192).
"""

from __future__ import annotations

import fnmatch
import re
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

SAMPLE_SCHEMA = StructType(
    [
        StructField("__key__", StringType()),
        StructField("__url__", StringType()),
        StructField("__member_idx__", LongType()),
        StructField("sample", MapType(StringType(), BinaryType())),
    ]
)

_META_RE = re.compile(r"^__[a-z0-9_]+__($|/)")


def base_plus_ext(path: str) -> tuple[str | None, str | None]:
    """Split member path into sample key + full (multi-)extension
    (reference ``base_plus_ext``, tariterators.py:24-38)."""
    m = re.match(r"^((?:.*/|)[^.]+)[.]([^/]*)$", path)
    if not m:
        return None, None
    return m.group(1), m.group(2)


def iter_tar_samples(
    fileobj,
    url: str,
    select_files=None,
    rename_files=None,
):
    """Stream (key, member_idx, {suffix: bytes}) samples from one tar.

    Implements the reference scan semantics (tariterators.py:97-246):
    skip non-regular members and ``__meta__``-style names; optional
    per-member ``rename_files`` (before grouping) and ``select_files``
    (before reading bytes); group *adjacent* members sharing a key prefix;
    duplicate suffix within a sample is an error.
    """
    stream = tarfile.open(fileobj=fileobj, mode="r|*")
    current_key = None
    current: dict[str, bytes] = {}
    idx = 0
    for member in stream:
        if not member.isreg():
            continue
        fname = member.name
        if _META_RE.match(fname.split("/")[-1]):
            continue
        if rename_files:
            fname = rename_files(fname)
        if select_files and not select_files(fname):
            continue
        key, suffix = base_plus_ext(fname)
        if key is None:
            continue
        if key != current_key:
            if current_key is not None and current:
                yield current_key, idx, current
                idx += 1
            current_key, current = key, {}
        if suffix in current:
            raise ValueError(f"duplicate suffix {suffix!r} for key {current_key!r} in {url}")
        data = stream.extractfile(member)
        current[suffix] = data.read() if data is not None else b""
        stream.members = []  # release member metadata (bounded memory)
    if current_key is not None and current:
        yield current_key, idx, current


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _filters_from_options(select: str | None, rename: str | None):
    select_files = None
    rename_files = None
    if select:
        globs = select.split(";")
        select_files = lambda f: any(fnmatch.fnmatch(f, g) for g in globs)  # noqa: E731
    if rename:
        pairs = [p.split("=", 1) for p in rename.split(";")]

        def rename_files(f: str) -> str:
            for new, old in pairs:
                if f.endswith("." + old):
                    return f[: -len(old)] + new
            return f

    return select_files, rename_files


def _read_shard(path: str, select: str | None, rename: str | None, gopen_kw: dict):
    """One shard → sample tuples; shared by the batch and stream readers.

    scheme-dispatch open (gopen.py:316-344 semantics): each executor
    streams its shard straight from file/pipe/http/s3 — the driver never
    proxies bytes."""
    select_files, rename_files = _filters_from_options(select, rename)
    from video_data_pipeline_spark.sources.gopen import gopen

    fh = gopen(path, "rb", **gopen_kw)
    try:
        for key, idx, sample in iter_tar_samples(fh, path, select_files, rename_files):
            yield (key, path, idx, sample)
    finally:
        fh.close()


def _gopen_kw(options: dict) -> dict:
    return {
        k: options[k]
        for k in ("endpoint_url", "access_key_id", "secret_access_key")
        if options.get(k)
    }


class _WebDatasetReader(DataSourceReader):
    def __init__(self, options: dict):
        self.paths = expand_paths(options.get("path", ""))
        self.select = options.get("select_files")
        self.rename = options.get("rename_files")
        self.gopen_kw = _gopen_kw(options)

    def partitions(self):
        return [_ShardPartition(p) for p in self.paths]

    def read(self, partition: _ShardPartition | None):
        if partition is None:
            # Spark substitutes a single None partition when partitions()
            # returns [] (empty shard list) — a legal empty dataset.
            return
        yield from _read_shard(partition.path, self.select, self.rename, self.gopen_kw)


class _WebDatasetStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("webdataset")`` — shards as a streaming
    source (the reference's "watch a bucket, ingest new tars" pattern that
    its DataLoader world can't express; ROADMAP round-1 #7).

    Offsets are the sorted set of discovered shard paths (JSON-serializable
    and replayable); each microbatch plans ONE partition PER NEW SHARD, so
    ingest parallelism scales with arrival rate and executors stream their
    shards directly via gopen — exactly-once per shard under checkpointing
    (Spark replays partitions(start, end) deterministically from offsets)."""

    def __init__(self, options: dict):
        self.path_spec = options.get("path", "")
        self.select = options.get("select_files")
        self.rename = options.get("rename_files")
        self.gopen_kw = _gopen_kw(options)
        # maxFilesPerTrigger analog: cap how many NEW shards one microbatch
        # ingests (admission control for backlog catch-up). Best-effort: the
        # cap is applied against the last offset this reader instance saw
        # (committed or returned), so the first batch after a driver restart
        # may exceed it once.
        raw = options.get("max_shards_per_batch")
        self.max_shards = int(raw) if raw else None
        self._base: set[str] = set()

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        discovered = sorted(set(expand_paths(self.path_spec)))
        if self.max_shards is None:
            return {"files": discovered}
        new = [p for p in discovered if p not in self._base][: self.max_shards]
        end = sorted(self._base | set(new))
        self._base = set(end)
        return {"files": end}

    def commit(self, end: dict) -> None:
        self._base |= set(end.get("files", []))

    def partitions(self, start: dict, end: dict):
        new = sorted(set(end.get("files", [])) - set(start.get("files", [])))
        return [_ShardPartition(p) for p in new]

    def read(self, partition: _ShardPartition | None):
        if partition is None:
            return
        yield from _read_shard(partition.path, self.select, self.rename, self.gopen_kw)


class WebDatasetDataSource(DataSource):
    """``spark.read.format("webdataset")`` — one row per tar sample.

    Options: ``select_files`` (``;``-separated globs kept, scan pushdown),
    ``rename_files`` (``new=old`` suffix rewrites, e.g. ``txt=cls``).
    """

    @classmethod
    def name(cls) -> str:
        return "webdataset"

    def schema(self) -> StructType:
        return SAMPLE_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _WebDatasetReader(self.options)

    def streamReader(self, schema: StructType) -> "_WebDatasetStreamReader":
        return _WebDatasetStreamReader(self.options)


def expand_paths(path_spec: str) -> list[str]:
    """Expand a path option (supports ``::``/braces via shardlists, plus
    filesystem globs and directories)."""
    import glob as globmod
    import os

    from video_data_pipeline_spark.sources.shardlists import expand_urls

    from video_data_pipeline_spark.sources.gopen import is_remote

    out: list[str] = []
    for p in expand_urls(path_spec.split(",")):
        if is_remote(p):
            # remote URL: no local glob/dir expansion (brace/`::` expansion
            # already happened in expand_urls)
            out.append(p)
        elif os.path.isdir(p):
            hits = []
            for pat in ("*.tar", "*.tgz", "*.tar.gz"):
                hits.extend(globmod.glob(os.path.join(p, pat)))
            out.extend(sorted(hits))
        elif any(ch in p for ch in "*?["):
            out.extend(sorted(globmod.glob(p)))
        else:
            out.append(p)
    return out


_REGISTERED: set[int] = set()


def register(spark: SparkSession) -> None:
    from video_data_pipeline_spark.session import ensure_shipped

    ensure_shipped(spark)
    key = id(spark)
    if key not in _REGISTERED:
        spark.dataSource.register(WebDatasetDataSource)
        _REGISTERED.add(key)


def read_webdataset(
    spark: SparkSession,
    paths: str | list[str],
    select_files: str | None = None,
    rename_files: str | None = None,
    endpoint_url: str | None = None,
    access_key_id: str | None = None,
    secret_access_key: str | None = None,
) -> DataFrame:
    """Scan tar shards into a sample DataFrame (see module docstring).

    ``paths`` may mix schemes (``file``/``pipe:``/``http(s)``/``s3``);
    ``endpoint_url`` (+ optional explicit keys) targets S3-compatible
    stores (MinIO etc.) — in production omit them and executors use the
    standard boto3 credential chain."""
    register(spark)
    if isinstance(paths, list):
        paths = ",".join(paths)
    reader = spark.read.format("webdataset").option("path", paths)
    opts = {
        "select_files": select_files,
        "rename_files": rename_files,
        "endpoint_url": endpoint_url,
        "access_key_id": access_key_id,
        "secret_access_key": secret_access_key,
    }
    for k, v in opts.items():
        if v:
            reader = reader.option(k, v)
    return reader.load()


def read_webdataset_stream(
    spark: SparkSession,
    paths: str | list[str],
    select_files: str | None = None,
    rename_files: str | None = None,
    max_shards_per_batch: int | None = None,
) -> DataFrame:
    """Streaming scan: new tar shards appearing under ``paths`` become
    microbatches (one partition per new shard). Combine with the streaming
    twins (streaming/jobs.py) or ``decode_columns`` exactly like the batch
    reader; checkpointing gives exactly-once per shard.
    ``max_shards_per_batch`` is the maxFilesPerTrigger analog — admission
    control so a backlog catches up in bounded microbatches. Use it with a
    processingTime trigger: ``availableNow`` captures one (capped) offset
    and stops, leaving the rest of the backlog for the next run."""
    register(spark)
    if isinstance(paths, list):
        paths = ",".join(paths)
    reader = spark.readStream.format("webdataset").option("path", paths)
    if select_files:
        reader = reader.option("select_files", select_files)
    if rename_files:
        reader = reader.option("rename_files", rename_files)
    if max_shards_per_batch:
        reader = reader.option("max_shards_per_batch", str(max_shards_per_batch))
    return reader.load()


#: suffix → Spark cast for :func:`decode_columns` (reference basichandlers,
#: autodecode.py:145-192; media suffixes stay binary + UDF)
_BASIC_DECODERS = {
    "txt": "string",
    "text": "string",
    "transcript": "string",
    "cls": "int",
    "cls2": "int",
    "index": "int",
    "inx": "int",
    "id": "int",
}


def decode_columns(
    df: DataFrame,
    json_schema: str | None = None,
    extra: dict[str, str] | None = None,
    keep_sample: bool = False,
    only: list[str] | None = None,
    suffixes: list[str] | None = None,
    sample_rows: int = 1024,
) -> DataFrame:
    """Promote map entries to typed top-level columns (the ``decode`` stage,
    filters.py:283-302 + autodecode).

    Text/int suffixes cast per the basic-handler table; ``json`` parses via
    ``from_json`` when ``json_schema`` is given (else stays a JSON string);
    unknown suffixes in ``extra`` use the given cast; media suffixes should
    stay in the map as binary for UDF decoding. ``only=`` restricts which
    suffixes are *decoded* — others surface as raw binary (reference
    ``decode(only=...)``/``Decoder.partial``, autodecode.py:482-547).

    Column discovery: pass ``suffixes=`` to skip inference entirely (the
    scale path — zero pre-pass); otherwise suffixes are inferred from the
    first ``sample_rows`` rows only (SURVEY §7: "schema inferred from a
    sampled scan"), NEVER a full-corpus pass. WebDataset shards are
    homogeneous by convention, so a bounded prefix sees every suffix; a
    suffix appearing only deeper into the corpus needs ``suffixes=``.
    """
    if suffixes is not None:
        present = set(suffixes)
    else:
        present = {
            row.k
            for row in df.limit(sample_rows)
            .select(F.explode(F.map_keys("sample")).alias("k"))
            .distinct()
            .collect()
        }
    cols = [F.col("__key__"), F.col("__url__"), F.col("__member_idx__")]
    decoders = dict(_BASIC_DECODERS)
    decoders.update(extra or {})

    def decode_one(raw, suffix: str):
        if suffix in ("json", "jsn"):
            s = raw.cast("string")
            return F.from_json(s, json_schema) if json_schema else s
        if suffix in decoders:
            return raw.cast("string").cast(decoders[suffix])
        return raw

    for suffix in sorted(present):
        raw = F.col("sample")[suffix]
        if only is not None and suffix not in only:
            cols.append(raw.alias(suffix.replace(".", "_")))
        elif suffix.endswith(".gz"):
            # member-level transparent decompression (reference gzfilter +
            # Continue, autodecode.py:430-463): gunzip, strip the .gz from
            # the surfaced name, and CONTINUE decoding by the inner suffix
            from video_data_pipeline_spark.session import ensure_shipped

            ensure_shipped(df.sparkSession)
            base = suffix[: -len(".gz")]
            cols.append(decode_one(_gunzip(raw), base).alias(base.replace(".", "_")))
        else:
            cols.append(decode_one(raw, suffix).alias(suffix.replace(".", "_")))
    if keep_sample:
        cols.append(F.col("sample"))
    return df.select(*cols)


@F.pandas_udf(BinaryType())
def _gunzip(s):
    """Arrow-batched gunzip for ``*.gz`` members (never row-at-a-time)."""
    import gzip

    return s.map(lambda b: None if b is None else gzip.decompress(bytes(b)))


def to_dict(*globs: str, sample_col: str = "sample"):
    """``to_dict`` suffix-pattern projection (filters.py:409-438): keep only
    map entries whose suffix matches any glob. JVM-side ``map_filter`` —
    works on *dynamic* per-row keys (unlike plan-time ``extract_keys``).
    """
    import fnmatch as _fn

    regex = "|".join(f"({_fn.translate(g)})" for g in globs)

    def _op(df: DataFrame) -> DataFrame:
        kept = F.map_filter(
            F.col(sample_col), lambda k, v: k.rlike(f"^(?:{regex})$")
        )
        return df.withColumn(sample_col, kept)

    return _op
