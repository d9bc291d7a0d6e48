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

    def _referenced_tables(self, query: str) -> set[str]:
        """Every table/view identifier the query references, extracted
        from Spark's OWN parser (UnresolvedRelation nodes in the parsed
        logical plan) — not regex — so backticked identifiers, string
        literals, subqueries, and CTE aliases are all handled exactly
        as the engine itself would resolve them."""
        parser = self.spark._jsparkSession.sessionState().sqlParser()
        plan = parser.parsePlan(query)
        refs: set[str] = set()
        ctes: set[str] = set()
        stack = [plan]
        while stack:
            node = stack.pop()
            cls = node.getClass().getSimpleName()
            if cls == "UnresolvedRelation":
                refs.add(node.tableName().lower())
            elif cls == "UnresolvedWith":
                rels = node.cteRelations()
                for i in range(rels.size()):
                    t = rels.apply(i)
                    ctes.add(t._1().lower())
                    stack.append(t._2())
            for coll in (node.children(), node.innerChildren()):
                for i in range(coll.size()):
                    stack.append(coll.apply(i))
        return refs - ctes

    def _grant_key_for(self, principal: str, ref: str) -> str | None:
        """The registered grant table name matching a referenced
        identifier (exact, or base-name ↔ qualified-name match)."""
        for (p, t), _ in self.grants.items():
            if p != principal:
                continue
            tl = t.lower()
            if ref == tl or ref == tl.split(".")[-1] or ref.split(".")[-1] == tl:
                return t
        return None

    @staticmethod
    def _replace_table_ref(query: str, ref: str, view: str) -> str:
        """Literal-safe, backtick-aware replacement of one table
        reference (qualified or base-name form) with the secured view
        name. Single-quoted string literals are left untouched."""
        parts = ref.split(".")
        def part_pat(p: str) -> str:
            return rf"(?:`{re.escape(p)}`|{re.escape(p)})"
        alts = []
        for i in range(len(parts)):  # full name, then each shorter suffix
            alts.append(r"\.".join(part_pat(p) for p in parts[i:]))
        pat = re.compile(
            rf"(?<![\w.`])(?:{'|'.join(alts)})(?![\w.`])", re.IGNORECASE
        )
        segs = re.split(r"('(?:[^']|'')*')", query)
        for i in range(0, len(segs), 2):  # even segments are outside literals
            segs[i] = pat.sub(view, segs[i])
        return "".join(segs)

    def sql(
        self, principal: str, query: str, *, tables: list[str] | None = None
    ) -> DataFrame:
        """G3: run one SQL string as a principal — every reference to a
        governed table resolves to that principal's secured view, so
        the same query text yields role-dependent results (or fails on
        a column outside the grant).

        DENY BY DEFAULT (the reference's Lake Formation model: an
        unauthorized query FAILS, comprehensive_rbac_demo.py:121-131):
        the set of referenced tables comes from Spark's parser, and any
        reference without a grant for this principal — including tables
        never registered with the governance layer — raises
        ``PermissionError`` instead of silently executing ungoverned.
        The ``tables`` kwarg is accepted for backward compatibility but
        the parsed reference set is authoritative.
        """
        del tables  # governance is derived from the query, not the caller
        rewritten = query
        for ref in sorted(self._referenced_tables(query), key=len, reverse=True):
            t = self._grant_key_for(principal, ref)
            if t is None:
                raise PermissionError(
                    f"principal={principal!r} has no grant on table {ref!r} "
                    "(deny by default)"
                )
            view = self.materialize_views(principal, t)
            rewritten = self._replace_table_ref(rewritten, ref, view)
        return self.spark.sql(rewritten)
