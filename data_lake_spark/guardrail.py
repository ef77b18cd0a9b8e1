"""Scan-budget guardrail: refuse to run queries that would scan more bytes
than a workgroup allows.

Parity target: the reference's Athena workgroup enforces
``BytesScannedCutoffPerQuery: 1 GB`` on every query
(``/root/reference/src/cloudformation/data-lake-stack.yml:284-286``) — the
one governance feature SURVEY §4 deferred. Athena meters bytes actually
scanned (columnar: only the row groups and column chunks read); this is the
pre-flight equivalent for Spark: walk the *executed plan's* parquet scans
(so Catalyst's column pruning and partition pruning are already reflected)
and price the scan from parquet footers — compressed bytes of just the
columns the scan reads, over just the files that survive partition
pruning.

The estimate is deliberately an upper bound where it cannot be exact
(non-local files whose footers we can't read are priced at full file
size): a guardrail must never under-estimate and wave through a 100 TB
full scan.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from urllib.parse import unquote

from pyspark.sql import DataFrame

# Athena's enforced default in the reference workgroup.
DEFAULT_BUDGET_BYTES = 1_000_000_000

# Reading every footer of a 100k-file table is itself a scan; sample.
_FOOTER_SAMPLE_FILES = 64

# Even a metadata-only scan (count(*) with aggregate pushdown reads no
# column chunks) touches every footer — charge that, so pruning more
# partitions always prices lower than pruning fewer.
_FOOTER_BYTES = 4096


class ScanBudgetExceeded(Exception):
    """Raised pre-execution when the estimated scan exceeds the budget."""


@dataclass
class RelationEstimate:
    root: str
    n_files: int
    raw_bytes: int  # file sizes after partition pruning
    scan_bytes: int  # column-pruned estimate actually charged
    columns: list[str] = field(default_factory=list)


@dataclass
class ScanEstimate:
    total_bytes: int
    relations: list[RelationEstimate]


def _strip_not_spans(s: str) -> str:
    """Remove every `NOT (...)` span (balanced parens) from a filter
    rendering. Spark prints `col != v` as `NOT (col#n = v)`; if the inner
    equality leaked through it would be misread as an INCLUSION filter and
    prune the listing to exactly the excluded partition — a silent
    under-estimate, the one failure mode this module must never have."""
    out: list[str] = []
    i = 0
    while True:
        j = s.find("NOT (", i)
        if j < 0:
            out.append(s[i:])
            return "".join(out)
        out.append(s[i:j])
        depth, k = 0, j + 4  # s[j+4] == "("
        while k < len(s):
            if s[k] == "(":
                depth += 1
            elif s[k] == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        i = k + 1


def _partition_equalities(plan_text: str) -> list[tuple[str, str]]:
    """Extract `col = value` equalities from PartitionFilters lines.

    Only plain positive equalities prune here; anything else (ranges, IN,
    and the equalities inside `NOT (...)` negation spans) leaves the file
    list untouched — over-estimating, never under-estimating.
    """
    out: list[tuple[str, str]] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan_text):
        text = _strip_not_spans(m.group(1))
        for eq in re.finditer(r"\(?(\w+)#\d+L?\)? = ([^,)\s]+)", text):
            out.append((eq.group(1), eq.group(2)))
    return out


def _column_fraction(files: list[str], columns: set[str]) -> float | None:
    """Fraction of compressed bytes held by `columns`, from parquet footers
    of a sample of local files. None when footers are unreadable."""
    try:
        import pyarrow.parquet as pq
    except Exception:  # pragma: no cover - pyarrow is baked in
        return None
    sample = files[:: max(1, len(files) // _FOOTER_SAMPLE_FILES)][
        :_FOOTER_SAMPLE_FILES
    ]
    want = total = 0
    for f in sample:
        path = f[len("file:") :] if f.startswith("file:") else f
        if not os.path.exists(path):
            return None
        try:
            meta = pq.read_metadata(path)
        except Exception:
            return None
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                sz = c.total_compressed_size
                total += sz
                # path_in_schema is dotted for nested; charge on the root.
                if c.path_in_schema.split(".")[0] in columns:
                    want += sz
    if total == 0:
        return None
    return want / total


def estimate_scan_bytes(df: DataFrame) -> ScanEstimate:
    """Pre-flight scan estimate for `df`'s plan, columnar-aware.

    Partition pruning: Catalyst's equality PartitionFilters are applied to
    the file listing by matching `col=value` path segments (the layout
    `partitionBy` writes). Column pruning: relation bytes are scaled by the
    footer-measured fraction of compressed bytes in the scan's
    requiredSchema columns.
    """
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan()
    # treeString truncates long filter lists; formatted explain does not.
    jvm = df.sparkSession._jvm
    plan_text = qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    prune = _partition_equalities(plan_text)

    def scan_leaves(node):
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            # AQE wraps the whole query; descend into the current plan.
            yield from scan_leaves(node.executedPlan())
            return
        leaves = node.collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            lname = leaf.getClass().getSimpleName()
            if lname == "AdaptiveSparkPlanExec":
                yield from scan_leaves(leaf.executedPlan())
            elif "FileSourceScan" in lname:
                yield leaf

    relations: list[RelationEstimate] = []
    for node in scan_leaves(plan):
        loc = node.relation().location()
        files = list(loc.inputFiles())
        for col, val in prune:
            seg = f"/{col}={val}/"
            hit = [f for f in files if f"/{col}=" in f]
            if not hit:  # only prune relations actually partitioned by col
                continue
            # Path segments are URL-escaped on disk (' ' → %20); compare
            # against the unescaped path too.
            kept = [f for f in hit if seg in f or seg in unquote(f)]
            if not kept:
                # The plan's literal rendering matched NO directory (value
                # truncated at whitespace by the regex, exotic escaping, or
                # a genuinely empty selection — indistinguishable here).
                # Dropping every hit file would price the relation at ~0
                # bytes: a silent under-estimate. Leave this column
                # unpruned instead (over-estimate).
                continue
            kept_set = set(kept)
            files = [f for f in files if f not in hit or f in kept_set]
        cols = list(node.requiredSchema().fieldNames())
        raw = 0
        for f in files:
            path = f[len("file:") :] if f.startswith("file:") else f
            if os.path.exists(path):
                raw += os.path.getsize(path)
            else:  # non-local: fall back to the file index's listing size
                raw = int(loc.sizeInBytes())
                files = list(loc.inputFiles())
                break
        frac = _column_fraction(files, set(cols))
        scan = int(raw * frac) if frac is not None else raw
        scan = min(raw, max(scan, len(files) * _FOOTER_BYTES))
        roots = loc.rootPaths()
        root = roots.apply(0).toString() if roots.size() > 0 else ""
        relations.append(
            RelationEstimate(
                root=root,
                n_files=len(files),
                raw_bytes=raw,
                scan_bytes=scan,
                columns=cols,
            )
        )
    return ScanEstimate(
        total_bytes=sum(r.scan_bytes for r in relations), relations=relations
    )


def check_scan_budget(
    df: DataFrame, max_bytes: int = DEFAULT_BUDGET_BYTES
) -> ScanEstimate:
    """Raise ScanBudgetExceeded before any executor reads a byte.

    Usage mirrors the Athena workgroup: wrap the serving layer's queries,
    `check_scan_budget(df); df.collect()`.
    """
    est = estimate_scan_bytes(df)
    if est.total_bytes > max_bytes:
        detail = ", ".join(
            f"{r.root}: {r.scan_bytes:,} B over {r.n_files} files "
            f"(cols {','.join(r.columns[:8])})"
            for r in est.relations
        )
        raise ScanBudgetExceeded(
            f"query would scan ~{est.total_bytes:,} bytes "
            f"(budget {max_bytes:,}): {detail}"
        )
    return est
