"""Table-mapping spec: the engine's persisted schema object.

Reference parity: the reference persists one JSON file per mapped table with
keys ``mastertable, alias, columnmappings[{alias, sql, hanadatatype}],
pkcolumns, initialloadwhere`` (S4HanaTableMapping.java:33-47,73-120; golden
sample src/test/resources/tmp/sap.hana.democontent.epm.data_x003a_x003aSO.
Header.json) plus the legacy nested-business-object keys ``relations[{detail,
schemafield, joincondition[{left,right}]}]`` (tmp JSON:76-160) which the
reference's parser ignores (parseValues, S4HanaTableMapping.java:248-254) but
this engine implements natively (structs/arrays are first-class in Spark —
see operators/nesting.py).

Column values are arbitrary SQL expressions, default ``"ALIAS"."COL"``
(ColumnMapping.sql, S4HanaTableMapping.java:284,683-738) — realized here as
``F.expr(sql).alias(alias)`` so computed columns ride Catalyst's codegen.

Name encoding: the reference encodes non-identifier characters as ``_xHHHH``
for Avro/file safety (AvroNameEncoder / FileNameEncoder,
S4HanaProducer.java:220, S4HanaTableMapping.java:79,103 — e.g. ``::`` becomes
``_x003a_x003a`` in the golden filename). Same scheme here.

Constraints kept from the reference: PKs are required ("This replication
technology does only work on tables with primary keys",
S4HanaTableMapping.java:133-136) and at most 6 PK columns
(S4HanaTableMapping.java:137-139).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s4hanaconnector_spark.types import hana_to_spark

MAX_PK_COLUMNS = 6  # S4HanaTableMapping.java:137

# dots stay literal: the reference's sample mapping filename
# (src/test/resources/tmp/sap.hana.democontent.epm.data_x003a_x003aSO.Header
# .json) encodes ``::`` but keeps ``.`` — FileNameEncoder escapes only
# filesystem-unsafe characters
_IDENT_OK = re.compile(r"[A-Za-z0-9.\-]")


def encode_name(name: str) -> str:
    """Encode a name so it is identifier/file safe (``::`` -> ``_x003a_x003a``),
    mirroring AvroNameEncoder/FileNameEncoder usage in the reference."""
    out: list[str] = []
    for i, ch in enumerate(name):
        if _IDENT_OK.match(ch) or (ch == "_" and not name[i + 1 : i + 2] == "x"):
            out.append(ch)
        else:
            cp = ord(ch)
            if cp > 0xFFFF:
                # per UTF-16 code unit, so the fixed 4-hex decode grammar
                # stays total and injective for astral characters (see
                # avro_schema.avro_encode_name)
                cp -= 0x10000
                out.append(f"_x{0xD800 + (cp >> 10):04x}")
                out.append(f"_x{0xDC00 + (cp & 0x3FF):04x}")
            else:
                out.append(f"_x{cp:04x}")
    return "".join(out)


def decode_name(name: str) -> str:
    """Inverse of :func:`encode_name`."""
    s = re.sub(r"_x([0-9a-fA-F]{4})", lambda m: chr(int(m.group(1), 16)), name)
    return s.encode("utf-16", "surrogatepass").decode("utf-16")


@dataclass
class ColumnMapping:
    """One output column: ``sql`` expression evaluated under the master-table
    alias, emitted ``AS alias`` (S4HanaTableMapping.java:683-738)."""

    alias: str
    sql: str
    hanadatatype: str | None = None

    @property
    def source_column(self) -> str | None:
        """Recover the bare column name from a simple ``"ALIAS"."COL"``
        expression (setSql, S4HanaTableMapping.java:694-738); None for
        computed expressions."""
        m = re.match(r'^\s*"[^"]+"\s*\.\s*"([^"]+)"\s*$', self.sql)
        return m.group(1) if m else None

    def as_spark(self) -> Column:
        expr = re.sub(r'"[^"]+"\s*\.\s*"([^"]+)"', r"`\1`", self.sql)
        return F.expr(expr).alias(self.alias)


@dataclass
class Relation:
    """Nested business-object relation (legacy model, tmp JSON:76-160)."""

    detail: "TableMapping"
    schemafield: str
    joincondition: list[dict]  # [{"left": col, "right": col}]


@dataclass
class TableMapping:
    """Declarative mapping of one source table to one output schema."""

    name: str
    mastertable: str
    alias: str = "L1"
    columnmappings: list[ColumnMapping] = field(default_factory=list)
    pkcolumns: list[str] = field(default_factory=list)
    initialloadwhere: str | None = None
    relations: list[Relation] = field(default_factory=list)

    def __post_init__(self) -> None:
        if not self.pkcolumns:
            # "This replication technology does only work on tables with
            # primary keys" (S4HanaTableMapping.java:133-136): a PK-less
            # mapping would key the CDC merge on ZERO columns downstream —
            # fail at construction, like the reference, not mid-merge
            raise ValueError(
                f"mapping {self.name!r} has no primary key columns — CDC "
                "replication requires a primary key"
            )
        if len(self.pkcolumns) > MAX_PK_COLUMNS:
            raise ValueError(
                f"Only {MAX_PK_COLUMNS} primary key columns are supported "
                f"(S4HanaTableMapping.java:137): {self.pkcolumns}"
            )

    # -- schema construction (O28, S4HanaTableMapping.java:577-597) ---------
    def struct_type(self) -> T.StructType:
        """Every field nullable; PK fields flagged in metadata
        (valueschema.add(..., true) / setPrimaryKey,
        S4HanaTableMapping.java:583-585)."""
        fields = []
        for cm in self.columnmappings:
            dtype = hana_to_spark(cm.hanadatatype) if cm.hanadatatype else T.StringType()
            meta = {}
            src = cm.source_column or cm.alias
            if src in self.pkcolumns:
                meta["pk_position"] = self.pkcolumns.index(src) + 1
            fields.append(T.StructField(cm.alias, dtype, nullable=True, metadata=meta))
        return T.StructType(fields)

    def projection(self) -> list[Column]:
        """Computed-column projection (E2/O30)."""
        return [cm.as_spark() for cm in self.columnmappings]

    def pk_aliases(self) -> list[str]:
        """Output aliases of the PK columns, in PK order."""
        by_src = {cm.source_column or cm.alias: cm.alias for cm in self.columnmappings}
        return [by_src.get(pk, pk) for pk in self.pkcolumns]

    # -- persistence (O29, S4HanaTableMapping.java:73-120) ------------------
    def to_json(self) -> dict:
        d: dict = {
            "name": self.name,
            "mastertable": self.mastertable,
            "alias": self.alias,
            "columnmappings": [
                {"alias": c.alias, "sql": c.sql, "hanadatatype": c.hanadatatype}
                for c in self.columnmappings
            ],
            "pkcolumns": list(self.pkcolumns),
        }
        if self.initialloadwhere:
            d["initialloadwhere"] = self.initialloadwhere
        if self.relations:
            d["relations"] = [
                {
                    "detail": r.detail.to_json(),
                    "schemafield": r.schemafield,
                    "joincondition": r.joincondition,
                }
                for r in self.relations
            ]
        return d

    @classmethod
    def from_json(cls, d: dict) -> "TableMapping":
        return cls(
            name=d.get("name", d["mastertable"]),
            mastertable=d["mastertable"],
            alias=d.get("alias", "L1"),
            columnmappings=[
                ColumnMapping(c["alias"], c["sql"], c.get("hanadatatype"))
                for c in d.get("columnmappings", [])
            ],
            pkcolumns=list(d.get("pkcolumns", [])),
            initialloadwhere=d.get("initialloadwhere"),
            relations=[
                Relation(
                    detail=cls.from_json(r["detail"]),
                    schemafield=r["schemafield"],
                    joincondition=r["joincondition"],
                )
                for r in d.get("relations", [])
            ],
        )

    def write(self, directory: str) -> str:
        """Persist to ``<dir>/BusinessObjects/<encoded name>.json``
        (S4HanaTableMapping.java:95-120)."""
        bo = os.path.join(directory, "BusinessObjects")
        os.makedirs(bo, exist_ok=True)
        path = os.path.join(bo, encode_name(self.name) + ".json")
        with open(path, "w") as f:
            json.dump(self.to_json(), f, indent=2)
        return path

    @classmethod
    def read(cls, directory: str, name: str) -> "TableMapping":
        path = os.path.join(directory, "BusinessObjects", encode_name(name) + ".json")
        with open(path) as f:
            return cls.from_json(json.load(f))

    @classmethod
    def list_mappings(cls, directory: str) -> list[str]:
        """Directory scan for ``*.json`` (S4HanaBrowse.java:48-64)."""
        bo = os.path.join(directory, "BusinessObjects")
        if not os.path.isdir(bo):
            return []
        return sorted(
            decode_name(f[: -len(".json")]) for f in os.listdir(bo) if f.endswith(".json")
        )

    def delete(self, directory: str) -> None:
        os.remove(os.path.join(directory, "BusinessObjects", encode_name(self.name) + ".json"))

    # -- inference (design-time import, SourceTableService.java:54-74) ------
    @classmethod
    def infer(
        cls,
        df: DataFrame,
        name: str,
        pkcolumns: list[str],
        alias: str = "L1",
        where: str | None = None,
    ) -> "TableMapping":
        """Infer a flat mapping from a DataFrame schema — the Spark analogue
        of the reference's column+PK catalog inference (addColumns,
        S4HanaTableMapping.java:272-321). PKs must be supplied (parquet has
        no PK constraint metadata), mirroring the DD03L fallback."""
        if not pkcolumns:
            raise ValueError(
                "This replication technology does only work on tables with "
                "primary keys (S4HanaTableMapping.java:133-136)"
            )
        cms = [
            ColumnMapping(alias=f.name, sql=f'"{alias}"."{f.name}"', hanadatatype=None)
            for f in df.schema.fields
        ]
        return cls(
            name=name,
            mastertable=name,
            alias=alias,
            columnmappings=cms,
            pkcolumns=pkcolumns,
            initialloadwhere=where,
        )
