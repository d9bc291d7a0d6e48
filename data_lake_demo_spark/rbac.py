"""Row- and column-level governance via secured views (SURVEY G1-G5).

The reference enforces this with Lake Formation data-cell filters +
column grants, checked by its RBAC demo suite
(rbac-demo/comprehensive_rbac_demo.py:109-216): the Core principal
sees only ``endpoint = 'api-a'`` rows and cannot select ``items``
(the query FAILS); the PII principal sees everything.

Spark realization: a grants registry maps principal → (row filter,
allowed columns). ``table_for`` returns the principal's secured
DataFrame; ``sql`` rewrites table references to the principal's
secured view before execution, preserving the reference's
"identical query, different results" contract (G3). Selecting a
column outside the grant raises ``AnalysisException`` — the engine's
equivalent of the reference's "query fails" semantics (G2).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Grant:
    """row_filter: SQL boolean expression or None (all rows);
    columns: allowed column names or None (all columns);
    masked: column → mask fn name ('md5' | 'null' | 'last4') — the
    column stays selectable but returns masked values (the softer
    alternative to a column DENY, cf. LF data filters)."""

    row_filter: str | None = None
    columns: list[str] | None = None
    masked: dict[str, str] | None = None


@dataclass
class Rbac:
    spark: SparkSession
    grants: dict[tuple[str, str], Grant] = field(default_factory=dict)

    def grant(
        self,
        principal: str,
        table: str,
        *,
        row_filter: str | None = None,
        columns: list[str] | None = None,
        masked: dict[str, str] | None = None,
    ) -> None:
        self.grants[(principal, table)] = Grant(row_filter, columns, masked)

    @staticmethod
    def _mask_expr(col: str, fn: str) -> str:
        if fn == "md5":
            return f"md5(CAST(`{col}` AS STRING)) AS `{col}`"
        if fn == "null":
            return f"CAST(NULL AS STRING) AS `{col}`"
        if fn == "last4":
            return f"right(CAST(`{col}` AS STRING), 4) AS `{col}`"
        raise ValueError(f"unknown mask fn: {fn}")

    def view_name(self, principal: str, table: str) -> str:
        base = table.split(".")[-1]
        return f"{base}__{principal}"

    def materialize_views(self, principal: str, table: str) -> str:
        """(Re)create the secured temp view for a principal; returns
        the view name. Idempotent; call after grants change."""
        g = self.grants.get((principal, table))
        if g is None:
            raise PermissionError(f"no grant for principal={principal} table={table}")
        masked = g.masked or {}
        if g.columns:
            col_list = g.columns
        elif masked:
            col_list = [f.name for f in self.spark.table(table).schema.fields]
        else:
            col_list = None
        if col_list is None:
            cols = "*"
        else:
            cols = ", ".join(
                self._mask_expr(c, masked[c]) if c in masked else f"`{c}`"
                for c in col_list
            )
        where = f"WHERE {g.row_filter}" if g.row_filter else ""
        view = self.view_name(principal, table)
        self.spark.sql(
            f"CREATE OR REPLACE TEMPORARY VIEW {view} AS "
            f"SELECT {cols} FROM {table} {where}"
        )
        return view

    def table_for(self, principal: str, table: str) -> DataFrame:
        """G1/G2: the principal's governed DataFrame."""
        return self.spark.table(self.materialize_views(principal, table))

    def sql(self, principal: str, query: str, *, tables: list[str]) -> DataFrame:
        """G3: run one SQL string as a principal — every reference to a
        governed table resolves to that principal's secured view, so
        the same query text yields role-dependent results (or fails on
        a column outside the grant)."""
        rewritten = query
        for t in tables:
            view = self.materialize_views(principal, t)
            base = t.split(".")[-1]
            # replace whole-word table identifiers (optionally qualified)
            rewritten = re.sub(
                rf"(?<![\w.`]){re.escape(t)}(?![\w.`])|(?<![\w.`]){re.escape(base)}(?![\w.`])",
                view,
                rewritten,
            )
        return self.spark.sql(rewritten)
