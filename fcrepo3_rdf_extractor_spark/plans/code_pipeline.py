"""End-to-end code-KG construction: the source-code twin of
``plans/pipeline.py``'s FOXML extraction plan.

Input is the north-rule source contract table
``(repo, path, commit, lang, content)``; output is the same quad schema
the FOXML pipeline emits (graph, subj, pred, obj_value, obj_is_literal,
obj_datatype, obj_lang) with the same per-row lineage columns
(repo, path, commit, content_sha256), so every downstream stage —
``dedup_exact`` on TRIPLE_KEY, ``materialize_graph`` subject-bucketed
layout, ``write_nquads``, the BGP/SPARQL compiler, ``run_resumable``
chunk checkpoints — is shared with the reference-parity pipeline
unchanged.

Emitted triples per file F = ``src:<repo>/<path>``:

- constants: ``(F, code:repo|code:path|code:commit|code:lang, literal)``
  and ``(F, code:sha256, sha2-256 hex)`` — the lineage invariant AS
  DATA, so content equality vs any other extraction of the same corpus
  is checkable by joining the graph itself.
- definitions (symbol-node modeling): ``(F, code:defines, S)`` with
  ``S = sym:<repo>/<path>#<name>``, plus ``(S, code:name, literal)``
  and ``(S, code:kind, literal)`` — keeps kind queryable through BGP
  (``?f code:defines ?s . ?s code:kind "py_class"``) without inventing
  per-kind predicates.
- imports: ``(F, code:imports, module literal)`` for every textual
  import, and with ``resolve=True`` additionally
  ``(F, code:dependsOn, src:<repo>/<defining path> | ext:<module>)`` —
  the entity-linked file->file edge from
  :func:`..operators.code.module_registry`.
- optional annotations (flag-gated): ``code:license`` /
  ``code:permissive`` (SPDX/header detection, The Stack's gate),
  ``code:cloneKey`` (type-2 clone hash), ``code:vendored``
  (cross-repo exact-content spread — a corpus-global branch), and
  ``code:calls`` symbol-linked call edges (mention-netted call sites
  resolved against the corpus-wide df-bounded callee registry — see
  :func:`..operators.code.call_graph_edges` for the semantics).

Scale shape (10^12 files): at default config the content column is
scanned exactly TWICE — once for the constants+definitions+annotations
branch (one projection, one Generate, zero shuffles) and once for the
imports branch (one Generate, then one hash equi-join against the
narrow module registry, which never reads content). Folding both into
one explode would force the registry join's shuffle key onto every
constant/definition row (null-keyed rows all hash to one reducer — a
skew hotspot), so two column-pruned, embarrassingly-parallel passes
are the cheaper plan. Each optional branch pays its own pass:
vendored = one hash-column pass + a per-hash count(distinct repo)
aggregate (linear in file count); calls = one mention-netting pass
over the wave plus a defs-only registry pass over the corpus, linked
by a df-bounded hash equi-join. No Python anywhere — regex extraction
cannot raise per-row, so unlike FOXML there is no error channel
(malformed source text simply matches no patterns).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.code import (
    DEF_PATTERNS,
    _module_key,
    _tagged_matches,
    deep_module_winner,
    module_registry,
    module_registry_deep,
    netted_call_mentions,
)
from ..operators.dedup import TRIPLE_KEY, dedup_exact
from ..operators.text import IMPORT_PATTERNS, clone_key_expr, with_license

XSD_BOOLEAN = "http://www.w3.org/2001/XMLSchema#boolean"

DEFAULT_CODE_GRAPH = "#code"

LINEAGE = ["repo", "path", "commit", "content_sha256"]


@dataclass
class CodeKgConfig:
    graph: str = DEFAULT_CODE_GRAPH
    resolve: bool = True        # emit code:dependsOn entity-linked edges
    deep_resolve: bool = False  # path-aware (parent.basename-first) linking
    calls: bool = False         # emit code:calls symbol-linked edges
    vendored: bool = False      # emit code:vendored (corpus-global agg)
    license: bool = False       # emit code:license / code:permissive
    clone_keys: bool = False    # emit code:cloneKey (type-2 clone hash)
    dedup: bool = True          # collapse duplicate quads at the output
    max_def: int = 100          # call-edge ambiguity / fan-out bound
    num_chunks: int = 64        # resumable-run granularity
    chunks_per_wave: int = 16
    subject_buckets: int = 256


def _t(
    subj: Column,
    pred: str,
    obj: Column,
    is_literal: bool,
    datatype: str | None = None,
) -> Column:
    """One triple struct; a NULL obj_value marks the slot absent and is
    filtered before the explode (e.g. an undetected license)."""
    return F.struct(
        subj.alias("subj"),
        F.lit(pred).alias("pred"),
        obj.cast("string").alias("obj_value"),
        F.lit(is_literal).alias("obj_is_literal"),
        (F.lit(datatype) if datatype else F.lit(None).cast("string")).alias(
            "obj_datatype"
        ),
    )


def _file_uri() -> Column:
    return F.concat(F.lit("src:"), F.col("repo"), F.lit("/"), F.col("path"))


def _finish(branch: DataFrame, graph: str) -> DataFrame:
    """Shared tail: explode the per-file triple array, attach graph and
    the always-NULL obj_lang (no language-tagged literals in this
    vocabulary), order columns to the pipeline's quad+lineage layout."""
    exploded = branch.select(
        *LINEAGE, F.explode("_triples").alias("_e")
    )
    return exploded.select(
        F.lit(graph).alias("graph"),
        F.col("_e.subj").alias("subj"),
        F.col("_e.pred").alias("pred"),
        F.col("_e.obj_value").alias("obj_value"),
        F.col("_e.obj_is_literal").alias("obj_is_literal"),
        F.col("_e.obj_datatype").alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_lang"),
        *LINEAGE,
    )


def _constants_branch(files: DataFrame, config: CodeKgConfig) -> DataFrame:
    """Constants + definitions (+ license/clone-key annotations): ONE
    content scan, one projection, one Generate. The definition matches
    expand to three structs each inside a ``transform`` lambda, so the
    whole branch is a single array concatenation exploded once — never
    a filter+union re-running the scan per triple family."""
    staged = files
    if config.license:
        staged = with_license(staged, text_col="content")
    if config.clone_keys:
        staged = staged.withColumn(
            "clone_key", clone_key_expr("content")
        )
    staged = staged.withColumn(
        "content_sha256", F.sha2(F.col("content"), 256)
    )
    furi = _file_uri()
    consts = [
        _t(furi, "code:repo", F.col("repo"), True),
        _t(furi, "code:path", F.col("path"), True),
        _t(furi, "code:commit", F.col("commit"), True),
        _t(furi, "code:sha256", F.col("content_sha256"), True),
    ]
    if "lang" in files.columns:
        consts.append(_t(furi, "code:lang", F.col("lang"), True))
    if config.license:
        consts.append(_t(furi, "code:license", F.col("license"), True))
        consts.append(
            _t(
                furi,
                "code:permissive",
                F.when(F.col("permissive") == 1, "true").otherwise("false"),
                True,
                XSD_BOOLEAN,
            )
        )
    if config.clone_keys:
        consts.append(_t(furi, "code:cloneKey", F.col("clone_key"), True))

    def sym(m: Column) -> Column:
        return F.concat(
            F.lit("sym:"),
            F.col("repo"),
            F.lit("/"),
            F.col("path"),
            F.lit("#"),
            m["name"],
        )

    defs = F.flatten(
        F.transform(
            _tagged_matches(F.col("content"), DEF_PATTERNS),
            lambda m: F.array(
                _t(furi, "code:defines", sym(m), False),
                _t(sym(m), "code:name", m["name"], True),
                _t(sym(m), "code:kind", m["kind"], True),
            ),
        )
    )
    triples = F.filter(
        F.concat(F.array(*consts), defs),
        lambda s: s["obj_value"].isNotNull(),
    )
    return _finish(
        staged.select(*LINEAGE, triples.alias("_triples")), config.graph
    )


def _with_def_path(
    rows: DataFrame,
    corpus: DataFrame,
    deep: bool,
    kind_col: str,
    module_col: str,
) -> DataFrame:
    """Attach ``_def_path`` (nullable) to import rows — the ONE
    definition of the dependsOn linking rule, shared by the fused plan
    branch and the incremental/from-state assembly (their ≡-plan pin
    depends on it). Shallow: basename-key left join against
    :func:`module_registry`. Deep: winner per DISTINCT
    (repo, kind, module) via :func:`deep_module_winner` joined back."""
    if deep:
        mods = rows.select(
            F.col("repo").alias("_repo"),
            F.col(kind_col).alias("kind"),
            F.col(module_col).alias("_module"),
        ).distinct()
        best = deep_module_winner(
            mods, module_registry_deep(corpus)
        ).select(
            F.col("_repo").alias("repo"),
            F.col("kind").alias(kind_col),
            F.col("_module").alias(module_col),
            "_def_path",
        )
        return rows.join(best, ["repo", kind_col, module_col], "left")
    registry = module_registry(corpus).withColumnRenamed("_repo", "repo")
    return (
        rows.withColumn(
            "_mkey", _module_key(F.col(module_col), F.col(kind_col))
        )
        .join(registry, ["repo", "_mkey"], "left")
        .drop("_mkey")
    )


def _imports_branch(
    files: DataFrame, config: CodeKgConfig, corpus: DataFrame
) -> DataFrame:
    """Raw import literals and (with ``resolve``) entity-linked
    dependsOn edges, BOTH projected from the same exploded-import frame
    so the registry join runs once. Without ``resolve`` there is no
    join at all. The registry builds over ``corpus`` (== ``files``
    except in resumable waves, where a wave's imports must resolve
    against the WHOLE corpus's modules or wave output would differ from
    a one-shot run)."""
    imp = files.select(
        "repo",
        "path",
        "commit",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        F.explode(
            _tagged_matches(F.col("content"), IMPORT_PATTERNS)
        ).alias("_e"),
    ).select(
        *LINEAGE,
        F.col("_e.kind").alias("_kind"),
        F.col("_e.name").alias("_module"),
    )
    furi = _file_uri()
    raw = _t(furi, "code:imports", F.col("_module"), True)
    if not config.resolve:
        return _finish(
            imp.select(*LINEAGE, F.array(raw).alias("_triples")),
            config.graph,
        )
    linked = _with_def_path(
        imp, corpus, config.deep_resolve, "_kind", "_module"
    )
    depends = _t(
        furi,
        "code:dependsOn",
        F.when(
            F.col("_def_path").isNotNull(),
            F.concat(
                F.lit("src:"), F.col("repo"), F.lit("/"), F.col("_def_path")
            ),
        ).otherwise(F.concat(F.lit("ext:"), F.col("_module"))),
        False,
    )
    return _finish(
        linked.select(*LINEAGE, F.array(raw, depends).alias("_triples")),
        config.graph,
    )


def _lineage_cols() -> list:
    """The lineage projection used by every content-scanning branch:
    the three identity columns plus the sha computed in the scan."""
    return [
        F.col("repo"),
        F.col("path"),
        F.col("commit"),
        F.sha2(F.col("content"), 256).alias("content_sha256"),
    ]


def _calls_branch(
    files: DataFrame, config: CodeKgConfig, corpus: DataFrame
) -> DataFrame:
    """``(F, code:calls, sym:<repo>/<def path>#<name>)`` — the call
    edges of :func:`..operators.code.call_graph_edges` with the wave's
    lineage columns carried through the per-file netting groupBy (path
    determines sha, so the extra group keys are free). The callee
    registry builds over ``corpus`` so a wave's calls resolve against
    symbols whose defining file lands in another wave. Multiplicity
    (n_calls) is deliberately dropped: the quad table is set-semantics
    and ``dedup_exact`` would collapse it anyway."""
    netted = netted_call_mentions(files, _lineage_cols()).withColumnRenamed(
        "n_calls", "_n"
    )
    registry = (
        corpus.select(
            F.col("repo"),
            F.col("path").alias("_dpath"),
            F.explode(
                _tagged_matches(F.col("content"), DEF_PATTERNS)
            ).alias("_d"),
        )
        .groupBy("repo", F.col("_d.name").alias("_name"))
        .agg(
            F.min("_dpath").alias("_def_path"),
            F.countDistinct("_dpath").alias("_nc"),
        )
        .filter(F.col("_nc") <= config.max_def)
        .drop("_nc")
    )
    linked = netted.join(registry, ["repo", "_name"])
    triple = _t(
        _file_uri(),
        "code:calls",
        F.concat(
            F.lit("sym:"),
            F.col("repo"),
            F.lit("/"),
            F.col("_def_path"),
            F.lit("#"),
            F.col("_name"),
        ),
        False,
    )
    return _finish(
        linked.select(*LINEAGE, F.array(triple).alias("_triples")),
        config.graph,
    )


def _vendored_branch(
    files: DataFrame, config: CodeKgConfig, corpus: DataFrame
) -> DataFrame:
    """``(F, code:vendored, true|false^^xsd:boolean)`` per file: the
    content hash's cross-repo spread, reusing the lineage sha256 as the
    spread key. One narrow hash pass, one two-phase
    count(distinct repo) per hash, one join back on the hash key. The
    spread aggregates over ``corpus`` (the whole table, even when
    ``files`` is one resumable wave — a wave-local spread would miss
    cross-wave copies)."""
    hashed = files.select(
        "repo",
        "path",
        "commit",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
    )
    spread = (
        corpus.select(
            "repo", F.sha2(F.col("content"), 256).alias("content_sha256")
        )
        .groupBy("content_sha256")
        .agg((F.countDistinct("repo") > 1).alias("_vend"))
    )
    flagged = hashed.join(spread, "content_sha256")
    triple = _t(
        _file_uri(),
        "code:vendored",
        F.when(F.col("_vend"), "true").otherwise("false"),
        True,
        XSD_BOOLEAN,
    )
    return _finish(
        flagged.select(*LINEAGE, F.array(triple).alias("_triples")),
        config.graph,
    )


#: Per-document staging rows (netted call mentions) live in the state
#: table alongside real quads so ONE table is the whole refresh state;
#: they are filtered out of every exported/assembled KG.
STAGING_PRED = "code:_callMention"


def _non_null_content(files: DataFrame) -> DataFrame:
    """NULL content -> ''. Without this a NULL-content row (easy via
    csv/json sources) would VANISH from the graph — regexp over NULL is
    NULL, the triple-array concat goes NULL, and the explode drops the
    file with its constant triples, violating the documented error
    model ('malformed text matches no patterns', never 'file
    disappears'). It would also sha to NULL, and NULL join keys never
    match, so incremental refresh would re-classify the row as changed
    forever."""
    if "content" not in files.columns:
        return files
    return files.withColumn(
        "content", F.coalesce(F.col("content"), F.lit(""))
    )


def code_kg_state(files: DataFrame, config: CodeKgConfig) -> DataFrame:
    """The per-document LOCAL layer: every row derivable from a file
    ALONE — constants/definitions/annotation quads, ``code:imports``
    quads carrying their match ``kind`` (the resolution join needs it),
    and, with ``config.calls``, ``code:_callMention`` staging rows (one
    per netted callee name). Schema = quad + lineage + ``kind``.

    This is the sound unit of incremental reuse: corpus-DEPENDENT
    triples (dependsOn, calls, vendored) are deliberately absent —
    an unchanged file's dependsOn edge can change when ANOTHER file
    starts or stops defining the module, so those edges must be
    re-assembled from the corpus state every refresh
    (:func:`code_kg_from_state`), never reused per-document."""
    files = _non_null_content(files)
    null_s = F.lit(None).cast("string")
    local = _constants_branch(files, config).withColumn("kind", null_s)
    imp = files.select(
        "repo",
        "path",
        "commit",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        F.explode(
            _tagged_matches(F.col("content"), IMPORT_PATTERNS)
        ).alias("_e"),
    )
    furi = _file_uri()
    imp_rows = imp.select(
        F.lit(config.graph).alias("graph"),
        furi.alias("subj"),
        F.lit("code:imports").alias("pred"),
        F.col("_e.name").alias("obj_value"),
        F.lit(True).alias("obj_is_literal"),
        null_s.alias("obj_datatype"),
        null_s.alias("obj_lang"),
        *LINEAGE,
        F.col("_e.kind").alias("kind"),
    )
    state = local.unionByName(imp_rows)
    if config.calls:
        netted = netted_call_mentions(files, _lineage_cols())
        mention_rows = netted.select(
            F.lit(config.graph).alias("graph"),
            furi.alias("subj"),
            F.lit(STAGING_PRED).alias("pred"),
            F.col("_name").alias("obj_value"),
            F.lit(True).alias("obj_is_literal"),
            null_s.alias("obj_datatype"),
            null_s.alias("obj_lang"),
            *LINEAGE,
            null_s.alias("kind"),
        )
        state = state.unionByName(mention_rows)
    return state


def code_kg_from_state(
    state: DataFrame, cur_ids: DataFrame, config: CodeKgConfig
) -> DataFrame:
    """Assemble the FULL knowledge graph from the per-document state
    plus the current identity table (repo, path, commit,
    content_sha256) — zero content reads:

    - module registry from ``cur_ids`` paths (narrow columns only)
    - ``code:dependsOn`` = stored import rows ⋈ registry (kind-aware)
    - ``code:calls`` = stored mention staging rows ⋈ the defs registry
      recovered from the stored ``code:defines`` triples (callee name =
      the sym URI fragment; defining path = the row's own lineage)
    - ``code:vendored`` = the identity table's sha spread

    ``code_kg_from_state(code_kg_state(files, c), ids(files), c)`` is
    row-identical to ``code_kg_plan(files, c)`` (pytest-pinned), so the
    incremental path can never drift from the one-shot plan."""
    quads = state.filter(F.col("pred") != STAGING_PRED).drop("kind")
    imports = state.filter(F.col("pred") == "code:imports")
    out = quads
    if config.resolve:
        linked = _with_def_path(
            imports, cur_ids, config.deep_resolve, "kind", "obj_value"
        )
        depends = linked.select(
            F.col("graph"),
            F.col("subj"),
            F.lit("code:dependsOn").alias("pred"),
            F.when(
                F.col("_def_path").isNotNull(),
                F.concat(
                    F.lit("src:"),
                    F.col("repo"),
                    F.lit("/"),
                    F.col("_def_path"),
                ),
            )
            .otherwise(F.concat(F.lit("ext:"), F.col("obj_value")))
            .alias("obj_value"),
            F.lit(False).alias("obj_is_literal"),
            F.lit(None).cast("string").alias("obj_datatype"),
            F.lit(None).cast("string").alias("obj_lang"),
            *LINEAGE,
        )
        out = out.unionByName(depends)
    if config.calls:
        defsreg = (
            state.filter(F.col("pred") == "code:defines")
            .select(
                "repo",
                F.substring_index("obj_value", "#", -1).alias("_name"),
                F.col("path").alias("_dpath"),
            )
            .groupBy("repo", "_name")
            .agg(
                F.min("_dpath").alias("_def_path"),
                F.countDistinct("_dpath").alias("_nc"),
            )
            .filter(F.col("_nc") <= config.max_def)
            .drop("_nc")
        )
        calls = (
            state.filter(F.col("pred") == STAGING_PRED)
            .withColumnRenamed("obj_value", "_name")
            .join(defsreg, ["repo", "_name"])
            .select(
                F.col("graph"),
                F.col("subj"),
                F.lit("code:calls").alias("pred"),
                F.concat(
                    F.lit("sym:"),
                    F.col("repo"),
                    F.lit("/"),
                    F.col("_def_path"),
                    F.lit("#"),
                    F.col("_name"),
                ).alias("obj_value"),
                F.lit(False).alias("obj_is_literal"),
                F.lit(None).cast("string").alias("obj_datatype"),
                F.lit(None).cast("string").alias("obj_lang"),
                *LINEAGE,
            )
        )
        out = out.unionByName(calls)
    if config.vendored:
        spread = cur_ids.groupBy("content_sha256").agg(
            (F.countDistinct("repo") > 1).alias("_vend")
        )
        vend = cur_ids.join(spread, "content_sha256").select(
            F.lit(config.graph).alias("graph"),
            _file_uri().alias("subj"),
            F.lit("code:vendored").alias("pred"),
            F.when(F.col("_vend"), "true").otherwise("false").alias(
                "obj_value"
            ),
            F.lit(True).alias("obj_is_literal"),
            F.lit(XSD_BOOLEAN).alias("obj_datatype"),
            F.lit(None).cast("string").alias("obj_lang"),
            *LINEAGE,
        )
        out = out.unionByName(vend)
    # match code_kg_plan's column order so stored one-shot/incremental
    # tables are interchangeable
    out = out.select(
        "graph", "subj", "pred", "obj_value", "obj_is_literal",
        "obj_datatype", "obj_lang", *LINEAGE,
    )
    if config.dedup:
        out = dedup_exact(out, key=TRIPLE_KEY)
    return out


@dataclass
class CodeIncrementalPlan:
    changed: DataFrame  # source rows that must re-scan content
    reused: DataFrame   # prior per-doc state rows still live
    state: DataFrame    # reused ∪ fresh — the next refresh's --previous
    output: DataFrame   # the assembled full KG


def code_kg_incremental(
    source: DataFrame,
    previous_state: DataFrame,
    config: CodeKgConfig | None = None,
) -> CodeIncrementalPlan:
    """Code-KG refresh without re-scanning the world: files whose
    (repo, path, commit, content_sha256) identity already exists in the
    prior per-document STATE reuse their local rows; only new/changed
    files pay the content regex passes; deleted files drop out via the
    semi-join. The corpus-dependent edge layers are then re-assembled
    from the (narrow) state — so an UNCHANGED file's dependsOn edge
    correctly flips when another file starts/stops defining its module,
    the case per-document reuse of edges would get wrong. Same
    4-column-identity semi/anti-join shape as the FOXML
    ``extract_incremental`` (pipeline.py).

    ``config`` must match the config the previous state was built with
    (flag set and graph): a state built without ``calls`` carries no
    mention staging rows, so flipping ``calls`` on mid-chain silently
    under-produces — rebuild fresh when changing flags."""
    config = config or CodeKgConfig()
    source = _non_null_content(source)
    ident = ["repo", "path", "commit", "content_sha256"]
    cur_ids = source.select(
        "repo",
        "path",
        "commit",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
    ).distinct()
    prev_ids = previous_state.select(*ident).distinct()
    changed = (
        source.withColumn("content_sha256", F.sha2(F.col("content"), 256))
        .join(prev_ids, ident, "left_anti")
        .drop("content_sha256")
    )
    fresh = code_kg_state(changed, config)
    reused = previous_state.select(*fresh.columns).join(
        cur_ids, ident, "left_semi"
    )
    state = reused.unionByName(fresh)
    output = code_kg_from_state(state, cur_ids, config)
    return CodeIncrementalPlan(
        changed=changed, reused=reused, state=state, output=output
    )


def code_kg_plan(
    files: DataFrame,
    config: CodeKgConfig | None = None,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """Full declarative plan: source-contract table -> quad+lineage
    DataFrame. With ``config.dedup`` duplicate quads collapse via
    ``dedup_exact`` on TRIPLE_KEY (deterministic ``min(struct)`` witness
    keeps ONE file's lineage per quad); leave ``dedup=False`` for the
    per-document layer that resumable/incremental maintenance needs —
    the same output-layer-dedup discipline as the FOXML pipeline.

    ``corpus`` is the corpus-global basis for import resolution and
    vendored spread; pass the FULL source table when ``files`` is a
    resumable wave so each wave's output equals the one-shot run's
    slice (defaults to ``files``)."""
    config = config or CodeKgConfig()
    files = _non_null_content(files)
    corpus = _non_null_content(corpus) if corpus is not None else files
    out = _constants_branch(files, config).unionByName(
        _imports_branch(files, config, corpus)
    )
    if config.calls:
        out = out.unionByName(_calls_branch(files, config, corpus))
    if config.vendored:
        out = out.unionByName(_vendored_branch(files, config, corpus))
    if config.dedup:
        out = dedup_exact(out, key=TRIPLE_KEY)
    return out
