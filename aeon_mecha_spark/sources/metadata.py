"""Rig/probe metadata sources (S8-S10) and the file-listing parser that
drives raw ingestion (SURVEY §3.3).

- probeinterface JSON → flattened electrode-geometry table (S9,
  /root/reference/aeon/dj_pipeline/utils/ephys_utils.py:438-473,511-595;
  FIXTURES.md §9): one row per contact, ElectrodeConfig = the subset with
  device_channel_index != −1 (384 active of 5120).
- probe_assignments.json → versioned serial→subject mapping (S10,
  ephys_utils.py:267-313): small lookup dim.
- chunk-file listing parser: path → (experiment, epoch_dir→timestamp,
  device, stream, chunk_ts) via regexp extraction (F8/F9), the relational
  input to sessionize.derive_epochs/derive_chunks — replacing the
  reference's row-at-a-time ingest loops (acquisition.py:219-306).

JSON parsing uses ``spark.read.json`` + explode — driver never loops over
contacts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aeon_mecha_spark.functions.time import parse_epoch_dir


def probe_geometry(spark: SparkSession, path: str) -> DataFrame:
    """Flatten probeinterface JSON (probes[].contact_positions,
    device_channel_indices, shank_ids, contact_ids) into one row per
    electrode."""
    raw = spark.read.option("multiLine", "true").json(path)
    probes = raw.select(F.posexplode("probes").alias("probe_idx", "p"))
    contacts = probes.select(
        "probe_idx",
        F.col("p.annotations.model_name").alias("probe_type"),
        F.posexplode(F.col("p.contact_positions")).alias("electrode", "pos"),
    ).select(
        "probe_idx",
        "probe_type",
        "electrode",
        F.col("pos")[0].cast("float").alias("x_coord"),
        F.col("pos")[1].cast("float").alias("y_coord"),
    )
    extras = probes.select(
        "probe_idx",
        F.posexplode(F.col("p.device_channel_indices")).alias("electrode", "device_channel_index"),
    )
    shanks = probes.select(
        "probe_idx", F.posexplode(F.col("p.shank_ids")).alias("electrode", "shank")
    ).withColumn("shank", F.col("shank").cast("int"))
    names = probes.select(
        "probe_idx", F.posexplode(F.col("p.contact_ids")).alias("electrode", "electrode_name")
    )
    out = (
        contacts.join(extras, ["probe_idx", "electrode"], "left")
        .join(shanks, ["probe_idx", "electrode"], "left")
        .join(names, ["probe_idx", "electrode"], "left")
    )
    return out.withColumn(
        "device_channel_index", F.coalesce(F.col("device_channel_index"), F.lit(-1)).cast("int")
    )


def electrode_config(geometry: DataFrame) -> DataFrame:
    """Active-contact subset + channel map (FIXTURES.md §9: ElectrodeConfig
    = device_channel_index != −1)."""
    return geometry.filter(F.col("device_channel_index") != -1)


def channel_map(geometry: DataFrame) -> DataFrame:
    """(electrode → amplifier channel) for active contacts only."""
    return electrode_config(geometry).select("probe_idx", "electrode", "device_channel_index")


def probe_assignments(spark: SparkSession, path: str) -> DataFrame:
    """Versioned probe-serial → subject mapping (S10): keep every version
    row; current = max(version) per serial."""
    raw = spark.read.option("multiLine", "true").json(path)
    return raw.select(F.explode("assignments").alias("a")).select(
        F.col("a.probe_serial").alias("probe_serial"),
        F.col("a.subject").alias("subject"),
        F.col("a.version").cast("int").alias("version"),
    )


# -- file-listing parser (S1 + F8/F9 + F1) -----------------------------------

def parse_chunk_listing(listing: DataFrame, path_col: str = "file_path") -> DataFrame:
    """File paths → relational ingestion facts.

    Expects ``<root>/<experiment>/<epoch_dir>/<device>/<Device>_<stream>_
    <chunk-ts>.<ext>`` (the reference's layout, architecture notebook
    cell 3). Pure regexp_extract — runs as a projection over the listing
    DataFrame, no driver loops.
    """
    p = F.col(path_col)
    file_name = F.element_at(F.split(p, "/"), -1)
    device_dir = F.element_at(F.split(p, "/"), -2)
    epoch_dir = F.element_at(F.split(p, "/"), -3)
    experiment = F.element_at(F.split(p, "/"), -4)
    chunk_ts_str = F.regexp_extract(file_name, r"_(\d{4}-\d{2}-\d{2}T\d{2}-\d{2}-\d{2})\.", 1)
    stream = F.regexp_extract(file_name, r"^[^_]+_(.+)_\d{4}-\d{2}-\d{2}T", 1)
    return listing.select(
        p.alias("file_path"),
        experiment.alias("experiment_name"),
        epoch_dir.alias("epoch_dir"),
        parse_epoch_dir(epoch_dir).alias("epoch_start"),
        device_dir.alias("device_name"),
        stream.alias("stream_name"),
        F.to_timestamp(chunk_ts_str, "yyyy-MM-dd'T'HH-mm-ss").alias("chunk_ts"),
    )


def strip_parens(col) -> "F.Column":
    """Remove parenthesized units from column labels, e.g.
    ``weight(g)`` → ``weight`` (F11, streams_maker.py:194,251)."""
    return F.regexp_replace(col, r"\([^)]*\)", "")


def snake_case(col) -> F.Column:
    """PascalCase → snake_case (F10, load_metadata.py:374-386)."""
    return F.lower(F.regexp_replace(col, r"(?<=[a-z0-9])([A-Z])", r"_$1"))


def pascal_case(col) -> F.Column:
    """snake_case → PascalCase (F10, load_metadata.py:822-837)."""
    parts = F.transform(F.split(col, "_"), lambda s: F.initcap(s))
    return F.array_join(parts, "")
