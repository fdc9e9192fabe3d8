"""Engine configuration: the reference's config grammar, validated eagerly.

Reference semantics (SURVEY.md section 1.5):

- ``hive.partition.columns`` grammar ``TABLE:COL1|COL2,TABLE2:COLA|...``
  parsed at HiveExportClient.java:79-96, uppercased both sides (:92).
- ``hive.uri`` must be a ``thrift://`` URI (HiveEndPointFactory.java:55-59);
  uri/db/table non-empty (:42-54).
- partition columns must exist in the table schema
  (PartitionedJsonDecoder.java:72-76) and be string-typed (:77-84).
- null/blank partition values are substituted with the unspecified token
  (PartitionedJsonDecoder.java:262, applied :223-225).

Two latent reference bugs are deliberately FIXED here, not replicated:

1. The reference never assigns its partition-count field, so a table absent
   from the partition spec silently exports unpartitioned
   (HiveExportClient.java:63,142-146 — dead guard). We fail loudly when a
   routed table has no partition spec unless ``allow_unpartitioned=True``.
2. The reference's same-count consistency check compares the multimap's
   total size against one table's count, spuriously failing for >=2 tables
   (HiveExportClient.java:97-111). We validate per table.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urlparse

# Default substitution token for null/blank partition values
# (reference: PartitionedJsonDecoder.java:262, README.md:111).
UNSPECIFIED_TOKEN = "__VoltDB_unspecified__"

_SPEC_TABLE_SPLIT = re.compile(r"\s*,\s*")
_SPEC_COL_SPLIT = re.compile(r"\s*\|\s*")


class ConfigError(ValueError):
    """Raised eagerly at construction time — never at first-row time.

    (Reference defers schema validation to first-row priming,
    HiveExportClient.java:137-163; we validate up front.)
    """


def parse_partition_spec(spec: str) -> dict[str, list[str]]:
    """Parse ``TABLE:C1|C2,TABLE2:CA`` into {TABLE: [C1, C2], ...}.

    Both table and column names are uppercased, matching
    HiveExportClient.java:92. Empty segments are rejected (the reference
    silently skipped malformed entries; we fail loudly).
    """
    out: dict[str, list[str]] = {}
    spec = spec.strip()
    if not spec:
        return out
    for entry in _SPEC_TABLE_SPLIT.split(spec):
        if ":" not in entry:
            raise ConfigError(
                f"malformed partition spec entry {entry!r}: expected TABLE:COL1|COL2"
            )
        table, cols = entry.split(":", 1)
        table = table.strip().upper()
        col_list = [c.strip().upper() for c in _SPEC_COL_SPLIT.split(cols) if c.strip()]
        if not table or not col_list:
            raise ConfigError(f"malformed partition spec entry {entry!r}")
        if table in out:
            raise ConfigError(f"table {table} listed twice in partition spec")
        out[table] = col_list
    return out


@dataclass
class ExportConfig:
    """Typed engine config (analog of HiveExportClient.configure,
    HiveExportClient.java:66-112)."""

    uri: str
    db: str
    table: str
    partition_columns: dict[str, list[str]] = field(default_factory=dict)
    timezone: str = "UTC"
    unspecified_token: str = UNSPECIFIED_TOKEN
    allow_unpartitioned: bool = False
    # Decoder builder knob camelCaseFieldNames
    # (PartitionedJsonDecoder.java:260,300-307): lowerCamelCase JSON payload
    # keys. Default off matches the production path, which hardcodes
    # camelCaseFieldNames(false) at HiveExportClient.java:152.
    camel_case_field_names: bool = False

    def __post_init__(self) -> None:
        if not self.uri or not self.uri.strip():
            raise ConfigError("uri must be defined and not empty")
        scheme = urlparse(self.uri).scheme
        if scheme not in ("thrift", "file", "hdfs", "s3", "s3a", "local"):
            # Reference accepts only thrift:// (HiveEndPointFactory.java:55-59);
            # we additionally accept filesystem warehouse URIs since the Spark
            # engine writes files directly rather than via the metastore RPC.
            raise ConfigError(f"unsupported warehouse URI scheme: {scheme!r}")
        if not self.db or not self.db.strip():
            raise ConfigError("db must be defined and not empty")
        if not self.table or not self.table.strip():
            raise ConfigError("table must be defined and not empty")
        if not self.unspecified_token:
            raise ConfigError("unspecified_token must be non-empty")
        # normalize spec casing like the reference (HiveExportClient.java:92)
        self.partition_columns = {
            t.upper(): [c.upper() for c in cols]
            for t, cols in self.partition_columns.items()
        }

    @classmethod
    def from_properties(cls, props: dict[str, str]) -> "ExportConfig":
        """Construct from a flat properties dict using the reference's keys
        (hive.uri / hive.db / hive.table / hive.partition.columns / timezone,
        HiveExportClient.java:66-96)."""
        return cls(
            uri=props.get("hive.uri", ""),
            db=props.get("hive.db", ""),
            table=props.get("hive.table", ""),
            partition_columns=parse_partition_spec(
                props.get("hive.partition.columns", "")
            ),
            timezone=props.get("timezone", "UTC"),
            allow_unpartitioned=props.get("allow.unpartitioned", "") == "true",
            camel_case_field_names=(
                props.get("camelcase.fieldnames", "") == "true"
            ),
        )

    def partition_cols_for(self, table: str) -> list[str]:
        """Partition columns for a table; loud failure for unlisted tables
        (fixing reference bug #1 — dead guard at HiveExportClient.java:142-146)."""
        cols = self.partition_columns.get(table.upper())
        if cols is None:
            if self.allow_unpartitioned:
                return []
            raise ConfigError(
                f"table {table} is not listed in the partition spec; "
                "set allow_unpartitioned=True to export it unpartitioned"
            )
        return cols

    def validate_against_schema(self, table: str, schema_fields: dict[str, str]) -> None:
        """Check partition columns exist and are string-typed against a
        {column_name: spark_type_simpleString} mapping
        (reference: PartitionedJsonDecoder.java:72-84)."""
        upper = {k.upper(): v for k, v in schema_fields.items()}
        for col in self.partition_cols_for(table):
            if col not in upper:
                raise ConfigError(
                    f"partition column {col} not present in table {table}"
                )
            if upper[col] != "string":
                raise ConfigError(
                    f"partition column {col} of table {table} must be string-typed, "
                    f"got {upper[col]}"
                )
