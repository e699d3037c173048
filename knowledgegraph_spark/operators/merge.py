"""Merge folds: component → canonical entity, triple canonicalize + group.

Spark-native form of the reference's merge layer:

  * group → canonical entity fold (systematic_merge_provider.py:713-850):
    first item of the group is primary, its surface name becomes the
    entity name; other surface names become aliases; array fields merge
    append-unique; scalar fields first-non-null — all as ONE hash
    aggregation with deterministic ordering by (warc_ts, url, ord), the
    explicit stand-in for the reference's batch-arrival order
    (systematic_merge_provider.py:717,724; divergence documented in
    SURVEY.md §7.4.3).

  * per-field merge strategies (entity_config.py:13-19, merge application
    merge_pipeline.py:133-160) as column expressions for the incremental
    upsert path (``merge_strategy_expr``).

  * relation endpoint resolution + grouping
    (systematic_merge_provider.py:944-1025): two equi-joins through the
    canonical mapping, then groupBy(subj, pred, obj) with
    collect_set / max(strength) — SURVEY.md §2.5 A4.

  * relation ids: sha2("{src}::{type}::{tgt}") — the systematic scheme
    (systematic_merge_provider.py:1193-1196).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from knowledgegraph_spark.config import (
    APPEND_UNIQUE,
    NODE_ARRAY_FIELDS,
    NODE_SCALAR_FIELDS,
    PRESERVE_EXISTING,
    REPLACE_ALWAYS,
    REPLACE_IF_BETTER,
)
from knowledgegraph_spark.operators.linking import with_node


def merge_strategy_expr(old: Column, new: Column, strategy: str) -> Column:
    """One merge strategy as a column expression (upsert WHEN MATCHED set).

    REPLACE_IF_BETTER is the reference's longer-string-wins
    (merge_pipeline.py:148-155) refined to a join-semilattice: max by
    (length, value).  The lexicographic tiebreak makes the operation
    associative + commutative, so salted folds, incremental upserts, and
    one-shot folds all converge to the same value regardless of arrival
    order — the reference's sequential replace-iff-longer is
    order-dependent on equal lengths.
    """
    if strategy == PRESERVE_EXISTING:
        return F.coalesce(old, new)
    if strategy == REPLACE_ALWAYS:
        return F.coalesce(new, old)
    if strategy == REPLACE_IF_BETTER:
        def key(c):
            return F.struct(
                F.length(F.coalesce(c, F.lit(""))).alias("l"),
                F.coalesce(c, F.lit("")).alias("v"),
            )

        return F.when(key(new) > key(old), new).otherwise(old)
    if strategy == APPEND_UNIQUE:
        return F.array_distinct(
            F.concat(
                F.coalesce(old, F.array().cast("array<string>")),
                F.coalesce(new, F.array().cast("array<string>")),
            )
        )
    raise ValueError(f"unknown merge strategy: {strategy}")


def if_better_agg(value: Column) -> Column:
    """REPLACE_IF_BETTER as an aggregate: max by (length, value) over a
    group — the within-batch fold form of the upsert strategy (same
    semilattice, so fold-then-upsert ≡ one big fold)."""
    return F.max(
        F.when(value.isNotNull(), F.struct(F.length(value).alias("l"), value.alias("v")))
    )["v"]


def _first_by_order(value: Column, order: Column) -> Column:
    """First non-null ``value`` by ``order`` — min over (order, value) structs
    (rows with null value excluded so min skips them)."""
    return F.min(F.when(value.isNotNull(), F.struct(order.alias("o"), value.alias("v"))))[
        "v"
    ]


def fold_entities(
    mentions: DataFrame,
    assignments: DataFrame,
    provenance_cap: int | None = None,
    n_salts: int = 8,
) -> DataFrame:
    """mentions + (node → component) → canonical entity nodes.

    Output columns: name, type, aliases, emails, domain, sources, plus the
    firstSeen(Ts|Url|Ord) provenance triplet that makes the first-wins
    ordering *portable across incremental runs* (pseudo-mentions re-enter
    later runs at their original position, so incremental canonical choice
    is identical to a one-shot run).
    Deterministic: every "first wins" choice is ordered by
    (warc_ts, url, ord).

    ``provenance_cap``: at web scale a head entity is mentioned on a large
    fraction of all pages; an uncapped ``sources`` array grows linearly
    with the corpus and turns its reducer into a straggler.  When set,
    sources keep the ``cap`` lexicographically-smallest urls (deterministic)
    and ``n_sources`` records the exact total.  Default None = full
    provenance (fixture-scale parity with the reference's append-unique
    semantics).

    When BOTH ``provenance_cap`` and salting are active, the cap is
    applied to the PARTIAL outputs too: each (component, salt) partial
    ships only its ``cap`` smallest urls/descriptions into the final
    shuffle.  This is exact — the global smallest-``cap`` elements are
    each the smallest within their own salt group (smallest-k is a
    semilattice merge) — and it bounds the partial→final shuffle to
    O(n_salts·cap) per component instead of O(mentions).  ``n_sources``
    stays exact: the salt is derived from ``url`` alone, so each distinct
    url lands in exactly one salt group and the per-salt distinct counts
    sum without overlap.

    ``n_salts``: head-entity skew guard (north_rule salted-key
    repartitioning).  The fold runs two-phase: partial aggregation on
    (component, salt) bounds any single task to ~1/n_salts of a head
    component's mentions, then a cheap final merge of the partials.  All
    merge functions are associative+commutative (min / set-union), so the
    result is bit-identical to the single-phase fold.  0 disables.
    Callers that can see the data (plans.pipeline) pick this adaptively
    via ``skew.pick_n_salts`` — 0 when no head keys exist.
    """
    m = with_node(mentions).join(assignments, "node")
    # attribute columns may be absent on minimal mention frames (older
    # callers/tests): treat missing as all-null
    for c in ("role", "worksAt", "title", "status", "location", "description"):
        if c not in m.columns:
            m = m.withColumn(c, F.lit(None).cast("string"))
    if "labels" not in m.columns:
        m = m.withColumn("labels", F.lit(None).cast("array<string>"))
    order = F.struct(
        F.col("warc_ts").alias("ts"), F.col("url").alias("u"), F.col("ord").alias("i")
    )
    src_url = F.when(~F.col("url").startswith("existing://"), F.col("url"))

    def _fbo(col_name):  # first-by-order partial (min of (order, value))
        c = F.col(col_name)
        return F.min(F.when(c.isNotNull(), F.struct(order.alias("o"), c.alias("v"))))

    if n_salts and n_salts > 1:
        partial = m.withColumn(
            # salt by url ONLY: a url's mentions all land in one salt
            # group, so per-salt distinct-url counts sum exactly (the
            # provenance_cap path's exact n_sources depends on this)
            "__salt", F.pmod(F.xxhash64("url"), F.lit(n_salts))
        ).groupBy("component", "__salt").agg(
            _fbo("name").alias("p_name"),
            F.first("type").alias("type"),
            F.collect_set("name").alias("p_names"),
            F.collect_set("email").alias("p_emails"),
            _fbo("domain").alias("p_dom"),
            F.sort_array(F.collect_set(src_url)).alias("p_sources"),
            F.min(order).alias("p_first"),
            # per-type attributes — every partial agg is a semilattice op
            # (min / max / set-union), so the two-phase fold is exact
            F.collect_set("role").alias("p_role"),
            F.collect_set("location").alias("p_location"),
            F.flatten(F.collect_list(F.coalesce(F.col("labels"), F.array()))).alias("p_labels"),
            _fbo("worksAt").alias("p_worksat"),
            _fbo("title").alias("p_title"),
            F.max(F.when(F.col("status").isNotNull(),
                         F.struct(F.length("status").alias("l"), F.col("status").alias("v")))).alias("p_status"),
            F.sort_array(F.collect_set("description")).alias("p_desc"),
        )
        extra_final_aggs = []
        if provenance_cap is not None:
            # cap the partial outputs: the shuffle into the final agg
            # carries ≤ cap urls/descriptions per (component, salt), and
            # the per-salt url counts (disjoint by construction) keep
            # n_sources exact
            partial = (
                partial.withColumn("p_nsrc", F.size("p_sources"))
                .withColumn("p_sources", F.slice("p_sources", 1, provenance_cap))
                .withColumn("p_desc", F.slice("p_desc", 1, provenance_cap))
            )
            extra_final_aggs = [F.sum("p_nsrc").alias("n_sources_exact")]
        agg = partial.groupBy("component").agg(
            F.min("p_name")["v"].alias("name"),
            F.first("type").alias("type"),
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("p_names")))).alias("all_names"),
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("p_emails")))).alias("emails"),
            F.min("p_dom")["v"].alias("domain"),
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("p_sources")))).alias("sources"),
            F.min("p_first").alias("first_seen"),
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("p_role")))).alias("role"),
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("p_location")))).alias("location"),
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("p_labels")))).alias("labels"),
            F.min("p_worksat").alias("worksAt_pair"),
            F.min("p_title").alias("title_pair"),
            F.max("p_status")["v"].alias("status"),
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("p_desc")))).alias("rawDescriptions"),
            *extra_final_aggs,
        )
    else:
        agg = m.groupBy("component").agg(
            _first_by_order(F.col("name"), order).alias("name"),
            F.first("type").alias("type"),
            F.sort_array(F.collect_set("name")).alias("all_names"),
            F.sort_array(F.collect_set("email")).alias("emails"),
            _first_by_order(F.col("domain"), order).alias("domain"),
            # pseudo-mentions (incremental seeding, plans.pipeline) carry
            # sentinel aliases that must not leak into provenance
            F.sort_array(F.collect_set(src_url)).alias("sources"),
            F.min(order).alias("first_seen"),
            F.sort_array(F.collect_set("role")).alias("role"),
            F.sort_array(F.collect_set("location")).alias("location"),
            F.sort_array(F.array_distinct(F.flatten(F.collect_list(F.coalesce(F.col("labels"), F.array()))))).alias("labels"),
            F.min(
                F.when(F.col("worksAt").isNotNull(), F.struct(order.alias("o"), F.col("worksAt").alias("v")))
            ).alias("worksAt_pair"),
            F.min(
                F.when(F.col("title").isNotNull(), F.struct(order.alias("o"), F.col("title").alias("v")))
            ).alias("title_pair"),
            if_better_agg(F.col("status")).alias("status"),
            F.sort_array(F.collect_set("description")).alias("rawDescriptions"),
        )
    sources = F.col("sources")
    n_sources = F.size("sources")
    raw_desc = F.col("rawDescriptions")
    if provenance_cap is not None:
        sources = F.slice(F.col("sources"), 1, provenance_cap)
        # rawDescriptions grow like provenance at web scale — same cap
        raw_desc = F.slice(F.col("rawDescriptions"), 1, provenance_cap)
        if "n_sources_exact" in agg.columns:
            # salted path: partials were capped pre-shuffle; the exact
            # total is the sum of the disjoint per-salt counts
            n_sources = F.col("n_sources_exact").cast("int")
    return agg.select(
        "name",
        "type",
        F.sort_array(F.array_remove(F.col("all_names"), F.col("name"))).alias("aliases"),
        "emails",
        "domain",
        sources.alias("sources"),
        n_sources.alias("n_sources"),
        "role",
        F.col("worksAt_pair")["v"].alias("worksAt"),
        F.col("title_pair")["v"].alias("title"),
        "status",
        "location",
        "labels",
        raw_desc.alias("rawDescriptions"),
        F.col("first_seen.ts").alias("firstSeenTs"),
        F.col("first_seen.u").alias("firstSeenUrl"),
        F.col("first_seen.i").alias("firstSeenOrd"),
        # per-attribute origin keys: the order key of the mention each
        # order-sensitive scalar was folded FROM (≥ firstSeen).  They let
        # pseudo-mentions re-enter later runs at the attribute's own
        # position, not the entity's firstSeen — closing the residual
        # incremental/one-shot divergence (round-3 advice item 1): a later
        # batch with an attr mention ordered between firstSeen and this
        # key now outranks the carried value exactly as a one-shot would.
        F.col("worksAt_pair")["o"]["ts"].alias("worksAtSeenTs"),
        F.col("worksAt_pair")["o"]["u"].alias("worksAtSeenUrl"),
        F.col("worksAt_pair")["o"]["i"].alias("worksAtSeenOrd"),
        F.col("title_pair")["o"]["ts"].alias("titleSeenTs"),
        F.col("title_pair")["o"]["u"].alias("titleSeenUrl"),
        F.col("title_pair")["o"]["i"].alias("titleSeenOrd"),
        F.col("component"),
    )


def canonical_mapping(
    mentions: DataFrame,
    assignments: DataFrame,
    canon: DataFrame | None = None,
    surface: DataFrame | None = None,
) -> DataFrame:
    """(type, normalized surface name) → canonical entity name.

    The Spark form of the reference's entity_mapping used for relation
    endpoint resolution (systematic_merge_provider.py:944-989).

    ``canon``: optional precomputed (component, canonical) frame — pass
    ``fold_entities`` output to avoid re-aggregating the same fold.

    ``surface``: optional precomputed distinct (node, type, norm_name)
    frame — the pipeline materializes this ONCE and shares it with the
    CC node set, so the full mention-stream scan + distinct shuffle here
    is skipped.  ``node = type|norm_name`` is a bijection, so the joined
    rows are already distinct per (type, norm_name) and the final
    dedup shuffle is skipped too.
    """
    if canon is not None:
        canon = canon.select("component", F.col("name").alias("canonical"))
    else:
        m = with_node(mentions).join(assignments, "node")
        order = F.struct("warc_ts", "url", "ord")
        canon = (
            m.groupBy("component")
            .agg(
                F.min(F.struct(order.alias("o"), F.col("name").alias("v")))["v"].alias(
                    "canonical"
                )
            )
        )
    if surface is not None:
        return (
            surface.select("node", "type", "norm_name")
            .join(assignments, "node")
            .join(canon, "component")
            .select("type", "norm_name", "canonical")
        )
    return (
        with_node(mentions)
        .select("node", "type", F.lower(F.trim(F.col("name"))).alias("norm_name"))
        .distinct()
        .join(assignments, "node")
        .join(canon, "component")
        .select("type", "norm_name", "canonical")
        .distinct()
    )


def resolve_and_fold_triples(
    raw_triples: DataFrame,
    mapping: DataFrame,
    provenance_cap: int | None = None,
    n_salts: int = 8,
) -> DataFrame:
    """raw triples → canonical, grouped triple table.

    Endpoint resolution = two equi-joins against the (small) canonical
    mapping — broadcast when it fits (Catalyst/AQE decides; the mapping is
    bounded by the number of distinct surface forms, far smaller than the
    triple stream).  Unresolved endpoints keep their surface form rather
    than dropping the triple (the mapping is built from the same extraction
    pass, so misses only occur for filtered entity types).
    """
    smap = mapping.select(
        F.col("type").alias("subj_type"),
        F.col("norm_name").alias("s_norm"),
        F.col("canonical").alias("s_canon"),
    )
    omap = mapping.select(
        F.col("type").alias("obj_type"),
        F.col("norm_name").alias("o_norm"),
        F.col("canonical").alias("o_canon"),
    )
    rt = raw_triples
    if "relation_tag" not in rt.columns:
        rt = rt.withColumn("relation_tag", F.lit(None).cast("string"))
    t = (
        rt.withColumn("s_norm", F.lower(F.trim(F.col("subj_name"))))
        .withColumn("o_norm", F.lower(F.trim(F.col("obj_name"))))
        .join(smap, ["subj_type", "s_norm"], "left")
        .join(omap, ["obj_type", "o_norm"], "left")
        .select(
            F.coalesce(F.col("s_canon"), F.col("subj_name")).alias("subj"),
            F.col("subj_type"),
            F.col("pred"),
            F.coalesce(F.col("o_canon"), F.col("obj_name")).alias("obj"),
            F.col("obj_type"),
            "strength",
            "description",
            "relation_tag",
            "url",
        )
    )
    keys = ["subj", "subj_type", "pred", "obj", "obj_type"]
    if n_salts and n_salts > 1:
        # two-phase salted fold: a head triple asserted on a large fraction
        # of pages would otherwise serialize its reducer (see fold_entities)
        partial = t.withColumn(
            "__salt", F.pmod(F.xxhash64("url"), F.lit(n_salts))
        ).groupBy(*keys, "__salt").agg(
            F.max("strength").alias("p_strength"),
            F.sort_array(F.collect_set("description")).alias("p_desc"),
            F.collect_set("relation_tag").alias("p_tags"),
            F.sort_array(F.collect_set("url")).alias("p_src"),
        )
        extra = []
        if provenance_cap is not None:
            # cap partial outputs pre-shuffle (exact: smallest-k union;
            # see fold_entities).  url-derived salt keeps per-salt url
            # counts disjoint, so n_sources stays the exact total.
            partial = (
                partial.withColumn("p_nsrc", F.size("p_src"))
                .withColumn("p_src", F.slice("p_src", 1, provenance_cap))
                .withColumn("p_desc", F.slice("p_desc", 1, provenance_cap))
            )
            extra = [F.sum("p_nsrc").alias("n_sources_exact")]
        grouped = partial.groupBy(*keys).agg(
            F.max("p_strength").alias("strength"),
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("p_desc")))).alias("descriptions"),
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("p_tags")))).alias("relationTags"),
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("p_src")))).alias("sources"),
            *extra,
        )
    else:
        grouped = t.groupBy(*keys).agg(
            F.max("strength").alias("strength"),
            F.sort_array(F.collect_set("description")).alias("descriptions"),
            F.sort_array(F.collect_set("relation_tag")).alias("relationTags"),
            F.sort_array(F.collect_set("url")).alias("sources"),
        )
    if provenance_cap is not None:
        n_src = (
            F.col("n_sources_exact").cast("int")
            if "n_sources_exact" in grouped.columns
            else F.size("sources")
        )
        grouped = (
            grouped.withColumn("n_sources", n_src)
            .withColumn("sources", F.slice(F.col("sources"), 1, provenance_cap))
            .withColumn("descriptions", F.slice(F.col("descriptions"), 1, provenance_cap))
            .drop("n_sources_exact")
        )
    return grouped.withColumn(
        "relation_id",
        F.sha2(F.concat_ws("::", F.col("subj"), F.col("pred"), F.col("obj")), 256),
    )


def fold_node_rows(df: DataFrame) -> DataFrame:
    """Collapse node rows sharing (type, name) into one, strategy-consistent.

    Used after re-canonicalization renames absorbed entities onto their new
    canonical name: arrays union-distinct, scalars first-by-firstSeen.
    Columns outside the core set (embedding, permissions, stamps, per-type
    attributes) are carried — string arrays union-distinct, everything
    else first-by-firstSeen — never dropped.
    """
    from pyspark.sql import types as T

    order = F.struct(
        F.col("firstSeenTs").alias("ts"),
        F.col("firstSeenUrl").alias("u"),
        F.col("firstSeenOrd").alias("i"),
    )

    def _flat(c):
        return F.sort_array(
            F.array_distinct(F.flatten(F.collect_list(F.coalesce(F.col(c), F.array()))))
        ).alias(c)

    aggs = [
        _flat("aliases"),
        _flat("emails"),
        _flat("sources"),
        _first_by_order(F.col("domain"), order).alias("domain"),
        F.min(order).alias("first_seen"),
    ]
    sel = [
        "type",
        "name",
        "aliases",
        "emails",
        "domain",
        "sources",
        F.col("first_seen.ts").alias("firstSeenTs"),
        F.col("first_seen.u").alias("firstSeenUrl"),
        F.col("first_seen.i").alias("firstSeenOrd"),
    ]
    core = {
        "type", "name", "aliases", "emails", "sources", "domain",
        "firstSeenTs", "firstSeenUrl", "firstSeenOrd", "n_sources",
    }
    if "n_sources" in df.columns:
        aggs.append(F.max("n_sources").alias("max_n_sources"))
        sel.append(
            F.greatest(F.size("sources"), F.col("max_n_sources")).alias("n_sources")
        )
    for field in df.schema.fields:
        c = field.name
        if c in core:
            continue
        if field.dataType == T.ArrayType(T.StringType()):
            aggs.append(_flat(c))
        else:
            aggs.append(_first_by_order(F.col(c), order).alias(c))
        sel.append(c)
    return df.groupBy("type", "name").agg(*aggs).select(*sel)


def apply_renames_to_nodes(existing: DataFrame, renames: DataFrame) -> DataFrame:
    """Re-canonicalization: rename absorbed entities onto their canonical.

    ``renames``: (type, old_name, canonical).  An absorbed row's name moves
    to its aliases; rows colliding on the canonical name are folded.  This
    is the step the reference cannot do (its per-group merge only ever
    merges INTO one existing row; two existing rows joined by new evidence
    stay split — systematic_merge_provider.py:321-393 first-hit-wins).
    """
    r = renames.select(
        "type", F.col("old_name").alias("name"), F.col("canonical")
    )
    renamed = (
        existing.join(r, ["type", "name"], "left")
        .withColumn(
            "aliases",
            F.when(
                F.col("canonical").isNotNull(),
                F.array_distinct(
                    F.concat(F.coalesce(F.col("aliases"), F.array()), F.array(F.col("name")))
                ),
            ).otherwise(F.col("aliases")),
        )
        .withColumn("name", F.coalesce(F.col("canonical"), F.col("name")))
        .drop("canonical")
    )
    return fold_node_rows(renamed)


def apply_renames_to_triples(triples: DataFrame, renames: DataFrame) -> DataFrame:
    """Rewrite triple endpoints through the rename map and re-group.

    Renames can collide previously-distinct triples; payload arrays merge
    and strength takes the max, then relation_id is recomputed.  Columns
    beyond the core set are carried, never dropped: string arrays
    union-distinct, createdAt min, lastUpdated max, others min
    (deterministic) — an embedding/permissions column a prior run
    materialized must survive the rewrite.
    """
    from pyspark.sql import types as T

    rs = renames.select(
        F.col("type").alias("subj_type"),
        F.col("old_name").alias("subj"),
        F.col("canonical").alias("s_new"),
    )
    ro = renames.select(
        F.col("type").alias("obj_type"),
        F.col("old_name").alias("obj"),
        F.col("canonical").alias("o_new"),
    )
    core = {"relation_id", "subj", "subj_type", "pred", "obj", "obj_type",
            "strength", "descriptions", "sources", "n_sources"}
    extras = [f for f in triples.schema.fields if f.name not in core]
    t = (
        triples.join(F.broadcast(rs), ["subj_type", "subj"], "left")
        .join(F.broadcast(ro), ["obj_type", "obj"], "left")
        .select(
            F.coalesce(F.col("s_new"), F.col("subj")).alias("subj"),
            "subj_type",
            "pred",
            F.coalesce(F.col("o_new"), F.col("obj")).alias("obj"),
            "obj_type",
            "strength",
            "descriptions",
            "sources",
            *([F.col("n_sources")] if "n_sources" in triples.columns else []),
            *[F.col(f.name) for f in extras],
        )
    )
    aggs = [
        F.max("strength").alias("strength"),
        F.sort_array(F.array_distinct(F.flatten(F.collect_list("descriptions")))).alias(
            "descriptions"
        ),
        F.sort_array(F.array_distinct(F.flatten(F.collect_list("sources")))).alias(
            "sources"
        ),
    ]
    if "n_sources" in triples.columns:
        aggs.append(F.max("n_sources").alias("n_sources"))
    for f in extras:
        if f.dataType == T.ArrayType(T.StringType()):
            aggs.append(
                F.sort_array(
                    F.array_distinct(
                        F.flatten(F.collect_list(F.coalesce(F.col(f.name), F.array())))
                    )
                ).alias(f.name)
            )
        elif f.name == "lastUpdated":
            aggs.append(F.max(f.name).alias(f.name))
        else:
            aggs.append(F.min(f.name).alias(f.name))
    grouped = t.groupBy("subj", "subj_type", "pred", "obj", "obj_type").agg(*aggs)
    return grouped.withColumn(
        "relation_id",
        F.sha2(F.concat_ws("::", F.col("subj"), F.col("pred"), F.col("obj")), 256),
    )


def propagate_permissions(
    table: DataFrame,
    page_permissions: DataFrame,
    key_cols: list[str],
    sources_col: str = "sources",
) -> DataFrame:
    """Document → entity/relation permissions propagation (SURVEY §2.11 O6,
    vespa_email_pipeline.py:624-666).

    ``page_permissions``: (url, permissions array<string>).  Each output
    row gains ``permissions`` = distinct union of the permissions of its
    contributing pages — explode sources, broadcast-join the page table,
    re-fold.  Rows with no matching page keep an empty array.
    """
    exploded = table.select(*key_cols, F.explode_outer(sources_col).alias("__url"))
    joined = exploded.join(
        page_permissions.select(
            F.col("url").alias("__url"), F.col("permissions").alias("__p")
        ),
        "__url",
        "left",
    )
    perms = (
        joined.groupBy(*key_cols)
        .agg(
            F.sort_array(
                F.array_distinct(
                    F.flatten(F.collect_list(F.coalesce(F.col("__p"), F.array())))
                )
            ).alias("permissions")
        )
    )
    return table.join(perms, key_cols, "left")


def _passthrough_cols(existing: DataFrame, incoming: DataFrame, handled: set[str]):
    """Shared-but-unconfigured columns must survive an upsert, not vanish.

    A later run with embed=False or page_permissions=None would otherwise
    destroy the embedding/permissions columns a prior run materialized.
    Semantics: ``lastUpdated`` replace-always (the stamp of the touching
    run wins), everything else preserve-existing (coalesce(e, n));
    one-sided columns are carried verbatim.
    """
    cols = []
    seen = list(dict.fromkeys(existing.columns + incoming.columns))
    for c in seen:
        if c in handled:
            continue
        if c in existing.columns and c in incoming.columns:
            if c == "lastUpdated":
                cols.append(F.coalesce(F.col(f"n.{c}"), F.col(f"e.{c}")).alias(c))
            else:
                cols.append(F.coalesce(F.col(f"e.{c}"), F.col(f"n.{c}")).alias(c))
        elif c in existing.columns:
            cols.append(F.col(f"e.{c}").alias(c))
        else:
            cols.append(F.col(f"n.{c}").alias(c))
    return cols


def upsert_entities(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """Set-oriented upsert of entity nodes by (type, name) with per-field
    merge strategies — the engine-level equivalent of Iceberg
    ``MERGE INTO ... WHEN MATCHED`` (kuzu_db_handler.py:170-376's
    per-entity HTTP upserts collapsed into one relational op).

    Works on any pair of frames sharing the node-table columns; the
    parquet-backed catalog calls this then rewrites the table atomically.
    ``createdAt`` preserves the first stamp; ``lastUpdated`` takes the
    incoming stamp when the row is touched (kuzu_db_handler.py:222,326).
    Unconfigured shared columns pass through preserve-existing.
    """
    strategies: dict[str, str] = {**NODE_SCALAR_FIELDS}
    for f in NODE_ARRAY_FIELDS:
        strategies[f] = APPEND_UNIQUE
    strategies["createdAt"] = PRESERVE_EXISTING
    strategies["lastUpdated"] = REPLACE_ALWAYS

    e = existing.alias("e")
    n = incoming.alias("n")
    joined = e.join(n, ["type", "name"], "full_outer")
    cols = [F.col("type"), F.col("name")]
    handled = {"type", "name"}
    # Order-sensitive scalars with a persisted origin key (fold_entities'
    # worksAtSeen*/titleSeen*): cross-run merge = min by the attribute's
    # OWN origin order — the upsert-level half of the one-shot-equivalent
    # "first by (warc_ts, url, ord)" contract.  PRESERVE_EXISTING (the
    # reference's batch-arrival first-wins) remains the fallback when
    # either side lacks the origin columns (legacy tables).
    for attr in ("worksAt", "title"):
        seen = [f"{attr}Seen{s}" for s in ("Ts", "Url", "Ord")]
        e_has = all(c in existing.columns for c in seen)
        n_has = all(c in incoming.columns for c in seen)
        if not (e_has or n_has):
            continue
        if e_has and n_has:
            def _pair(side, attr=attr, seen=seen):
                return F.struct(
                    F.col(f"{side}.{seen[0]}").alias("ts"),
                    F.col(f"{side}.{seen[1]}").alias("u"),
                    F.col(f"{side}.{seen[2]}").alias("i"),
                    F.col(f"{side}.{attr}").alias("v"),
                )

            best = F.least(
                F.when(F.col(f"e.{attr}").isNotNull(), _pair("e")),
                F.when(F.col(f"n.{attr}").isNotNull(), _pair("n")),
            )
            cols += [
                best["v"].alias(attr),
                best["ts"].alias(seen[0]),
                best["u"].alias(seen[1]),
                best["i"].alias(seen[2]),
            ]
        else:
            # One side lacks the origin keys (legacy-warehouse upgrade
            # window).  The value keeps the PRESERVE_EXISTING fallback, but
            # the emitted Seen* keys must follow the WINNING side — carried
            # when that side has them, synthesized from its firstSeen*
            # otherwise.  Passing the one-sided incoming keys through
            # verbatim (the pre-round-5 behavior) paired the kept existing
            # value with the LOSING mention's origin key; worse, a null
            # SeenTs struct sorts FIRST in min, so on the next run the
            # pseudo-mention re-entered at rank -inf and permanently
            # outranked every real mention (round-4 advice item 1).
            def _key(side, i, seen=seen):
                side_cols = existing.columns if side == "e" else incoming.columns
                if seen[i] in side_cols:
                    return F.col(f"{side}.{seen[i]}")
                fs = ("firstSeenTs", "firstSeenUrl", "firstSeenOrd")[i]
                if fs in side_cols:
                    return F.col(f"{side}.{fs}")
                src = existing if seen[i] in existing.columns else incoming
                dtype = dict((f.name, f.dataType) for f in src.schema.fields).get(
                    seen[i]
                )
                return F.lit(None).cast(dtype) if dtype is not None else F.lit(None)

            # A frame may carry the Seen* keys' COUNTERPART side without
            # the attr column itself (attr-less legacy tables): reference
            # each side's attr only when that side has it — the
            # pre-round-6 unconditional F.col("e.worksAt")/F.col("n.worksAt")
            # raised AnalysisException exactly where the old strategies-
            # loop fallback used to apply (round-5 advice item 3).
            e_attr = (
                F.col(f"e.{attr}")
                if attr in existing.columns
                else F.lit(None).cast("string")
            )
            n_attr = (
                F.col(f"n.{attr}")
                if attr in incoming.columns
                else F.lit(None).cast("string")
            )
            e_wins = e_attr.isNotNull()
            n_wins = ~e_wins & n_attr.isNotNull()
            cols.append(F.coalesce(e_attr, n_attr).alias(attr))
            for i in range(3):
                cols.append(
                    F.when(e_wins, _key("e", i))
                    .when(n_wins, _key("n", i))
                    .alias(seen[i])
                )
        handled |= {attr, *seen}
    for f, strat in strategies.items():
        if f in handled:
            continue
        if f in existing.columns and f in incoming.columns:
            cols.append(merge_strategy_expr(F.col(f"e.{f}"), F.col(f"n.{f}"), strat).alias(f))
            handled.add(f)
        elif f in existing.columns or f in incoming.columns:
            side = "e" if f in existing.columns else "n"
            cols.append(F.col(f"{side}.{f}").alias(f))
            handled.add(f)
    # n_sources: exact when provenance is uncapped (size of the merged
    # set); with a cap it is a lower bound (overlap across runs unknown).
    if "n_sources" in existing.columns and "n_sources" in incoming.columns:
        merged_sources = merge_strategy_expr(
            F.col("e.sources"), F.col("n.sources"), APPEND_UNIQUE
        )
        cols.append(
            F.greatest(
                F.size(merged_sources),
                F.coalesce(F.col("e.n_sources"), F.lit(0)),
                F.coalesce(F.col("n.n_sources"), F.lit(0)),
            ).alias("n_sources")
        )
        handled.add("n_sources")
    # firstSeen provenance: minimum of both sides (struct comparison), so
    # the cross-run ordering key never drifts forward.
    if "firstSeenTs" in existing.columns and "firstSeenTs" in incoming.columns:
        def _fs(side):
            return F.struct(
                F.col(f"{side}.firstSeenTs").alias("ts"),
                F.col(f"{side}.firstSeenUrl").alias("u"),
                F.col(f"{side}.firstSeenOrd").alias("i"),
            )

        fs = F.least(
            F.when(F.col("e.firstSeenTs").isNotNull(), _fs("e")),
            F.when(F.col("n.firstSeenTs").isNotNull(), _fs("n")),
        )
        cols += [
            fs["ts"].alias("firstSeenTs"),
            fs["u"].alias("firstSeenUrl"),
            fs["i"].alias("firstSeenOrd"),
        ]
        handled |= {"firstSeenTs", "firstSeenUrl", "firstSeenOrd"}
    cols += _passthrough_cols(existing, incoming, handled)
    return joined.select(*cols)


def upsert_triples(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """Upsert triples by relation_id: arrays append-unique, strength max,
    scalars preserve (schema.yaml:141-155 semantics).

    String-array columns present on both sides (relationTags, permissions)
    merge append-unique; other shared columns pass through
    preserve-existing (lastUpdated replace-always), and one-sided columns
    are carried verbatim — a run that skips embeddings or permissions
    must not destroy what a prior run materialized.
    """
    e = existing.alias("e")
    n = incoming.alias("n")
    joined = e.join(n, ["relation_id"], "full_outer")

    def arr(f):
        return merge_strategy_expr(F.col(f"e.{f}"), F.col(f"n.{f}"), APPEND_UNIQUE).alias(f)

    cols = [
        F.col("relation_id"),
        F.coalesce(F.col("e.subj"), F.col("n.subj")).alias("subj"),
        F.coalesce(F.col("e.subj_type"), F.col("n.subj_type")).alias("subj_type"),
        F.coalesce(F.col("e.pred"), F.col("n.pred")).alias("pred"),
        F.coalesce(F.col("e.obj"), F.col("n.obj")).alias("obj"),
        F.coalesce(F.col("e.obj_type"), F.col("n.obj_type")).alias("obj_type"),
        F.greatest(F.col("e.strength"), F.col("n.strength")).alias("strength"),
        arr("descriptions"),
        arr("sources"),
    ]
    handled = {
        "relation_id", "subj", "subj_type", "pred", "obj", "obj_type",
        "strength", "descriptions", "sources",
    }
    for c in ("relationTags", "permissions"):
        if c in existing.columns and c in incoming.columns:
            cols.append(arr(c))
            handled.add(c)
    if "n_sources" in existing.columns and "n_sources" in incoming.columns:
        cols.append(
            F.greatest(
                F.coalesce(F.col("e.n_sources"), F.lit(0)),
                F.coalesce(F.col("n.n_sources"), F.lit(0)),
            ).alias("n_sources")
        )
        handled.add("n_sources")
    cols += _passthrough_cols(existing, incoming, handled)
    return joined.select(*cols)
