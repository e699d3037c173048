"""End-to-end KG construction: pages → entity_nodes + triples.

The Spark job graph replacing the reference's orchestrator
(vespa_email_pipeline.py:526-622 — fetch → filter-processed → per-doc LLM
extract → in-batch dedup → DB match → per-group merge → per-row upserts):

    pages ─ extract_text (Arrow UDF)
          ─ extract mentions+triples (Arrow UDF, one pass)   [stage table]
          ─ match keys → star edges (+ alias-dict broadcast edges)
          ─ connected components (large-star/small-star)
          ─ fold entities / resolve+fold triples
          ─ upsert into entity_nodes / triples               [commits]

All stage boundaries are catalog tables, so any stage re-runs idempotently
from the previous table (the reference's "replayable merge" property,
SURVEY.md §3.2, gained structurally).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowledgegraph_spark.operators.components import assign_components
from knowledgegraph_spark.operators.extraction import (
    MAX_TEXT_BYTES,
    errors_of,
    extract_mentions_and_triples,
    mentions_of,
    triples_of,
)
from knowledgegraph_spark.operators.html_text import with_extracted_text
from knowledgegraph_spark.operators.linking import (
    build_alias_dict,
    dict_match_edges,
    match_edges,
    mention_match_keys,
    with_node,
)
from knowledgegraph_spark.operators.merge import (
    apply_renames_to_nodes,
    apply_renames_to_triples,
    canonical_mapping,
    fold_entities,
    propagate_permissions,
    resolve_and_fold_triples,
    upsert_entities,
    upsert_triples,
)
from knowledgegraph_spark.sources.catalog import Catalog


@dataclass
class KGResult:
    entities: DataFrame
    triples: DataFrame
    mentions: DataFrame
    assignments: DataFrame
    extracted: DataFrame | None = None  # unified mention+triple rows (persisted)


def _existing_as_mentions(entities: DataFrame) -> DataFrame:
    """Existing canonical entities re-entering the CC pass as pseudo-mentions.

    Each carries its ORIGINAL firstSeen ordering key, so the first-wins
    folds make exactly the choice a one-shot run over all pages would make
    (incremental ≡ one-shot — the reference's merge-into-existing,
    systematic_merge_provider.py:569-704, strengthened to a provable
    equivalence).  ``existing_name`` marks pseudo rows for the
    re-canonicalization rename detection.
    """
    has_fs = "firstSeenTs" in entities.columns
    return entities.select(
        (F.col("firstSeenUrl") if has_fs else F.concat(F.lit("existing://"), F.col("name"))).alias("url"),
        (F.col("firstSeenTs") if has_fs else F.to_timestamp(F.lit("1970-01-01"))).alias("warc_ts"),
        (F.col("firstSeenOrd") if has_fs else F.lit(0)).alias("ord"),
        F.col("name"),
        F.col("type"),
        F.explode_outer(
            F.when(F.size("emails") > 0, F.col("emails")).otherwise(
                F.array(F.lit(None).cast("string"))
            )
        ).alias("email"),
        F.col("domain"),
        F.col("name").alias("existing_name"),
    )


def build_kg(
    spark: SparkSession,
    pages: DataFrame,
    existing_entities: DataFrame | None = None,
    persist: bool = True,
    provenance_cap: int | None = None,
    max_component_size: int | None = None,
) -> KGResult:
    """One-shot (or incremental, when ``existing_entities`` given) build.

    Returns unmaterialized DataFrames; ``run_pipeline`` adds the stage
    tables, checkpoint ledger, and upsert commits.
    """
    pt = with_extracted_text(pages)
    ext = extract_mentions_and_triples(pt)
    if persist:
        ext = ext.persist()

    mentions = mentions_of(ext)
    raw_triples = triples_of(ext)

    if existing_entities is not None:
        mentions = mentions.unionByName(
            _existing_as_mentions(existing_entities), allowMissingColumns=True
        )

    keys = mention_match_keys(mentions)
    edges = match_edges(keys)
    if existing_entities is not None:
        alias_dict = build_alias_dict(existing_entities)
        edges = edges.unionByName(dict_match_edges(keys, alias_dict))

    nodes = with_node(mentions).select("node")
    assignments = assign_components(nodes, edges, max_component_size=max_component_size)
    if persist:
        assignments = assignments.persist()

    entities = fold_entities(mentions, assignments, provenance_cap=provenance_cap)
    if persist:
        entities = entities.persist()
    mapping = canonical_mapping(mentions, assignments, canon=entities)
    triples = resolve_and_fold_triples(raw_triples, mapping, provenance_cap=provenance_cap)
    return KGResult(
        entities=entities,
        triples=triples,
        mentions=mentions,
        assignments=assignments,
        extracted=ext,
    )


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    warehouse: str,
    session_id: str = "session-0",
    provenance_cap: int | None = None,
    embed: bool = False,
    page_permissions: DataFrame | None = None,
    max_component_size: int | None = None,
    max_text_bytes: int = MAX_TEXT_BYTES,
) -> Catalog:
    """Materializing run: stage tables + idempotent commits + ledger.

    Resume contract: pages already present in the checkpoint ledger are
    anti-joined away (the reference's processed-ids filter,
    vespa_email_pipeline.py:189-200, as a left-anti join); re-running after
    a kill at any point re-processes only unledgered pages, and the
    upserts are idempotent (append-unique / max / preserve semantics), so
    run-twice ≡ run-once.

    Quarantine contract (reference failed_emails ledger,
    vespa_email_pipeline.py:61,105-127): a page whose extraction throws
    lands in ``failed_pages`` with its error and is ledgered
    status='failed' — skipped on resume until ``admin.reset_failed``.
    """
    cat = Catalog(spark, warehouse)

    if cat.exists("checkpoint_ledger"):
        done = cat.read("checkpoint_ledger").select("url").distinct()
        todo = pages.join(done, "url", "left_anti")
    else:
        todo = pages

    if todo.isEmpty():
        return cat

    existing = cat.read("entity_nodes") if cat.exists("entity_nodes") else None
    if existing is not None and existing.isEmpty():
        existing = None  # fresh (admin.init-created) table: nothing to link against

    # Stage 1+2: text + extraction, materialized once (UDF runs once even
    # though two downstream branches consume it).
    pt = with_extracted_text(todo)
    ext = extract_mentions_and_triples(pt, max_text_bytes=max_text_bytes)
    cat.write(ext, "stage_extracted")
    ext = cat.read("stage_extracted")

    # Quarantine: error rows → failed_pages side table (O(delta) append).
    # The kind='error' filter prunes at the parquet scan.
    failed = errors_of(ext).withColumn("session_id", F.lit(session_id))
    if not failed.isEmpty():
        cat.append(failed, "failed_pages")

    mentions = mentions_of(ext)
    raw_triples = triples_of(ext)
    if existing is not None:
        mentions = mentions.unionByName(
            _existing_as_mentions(existing), allowMissingColumns=True
        )

    keys = mention_match_keys(mentions)
    edges = match_edges(keys)
    if existing is not None:
        edges = edges.unionByName(dict_match_edges(keys, build_alias_dict(existing)))

    nodes = with_node(mentions).select("node")
    assignments = assign_components(nodes, edges, max_component_size=max_component_size)
    cat.write(assignments, "stage_assignments")
    assignments = cat.read("stage_assignments")

    entities_f = fold_entities(mentions, assignments, provenance_cap=provenance_cap)
    mapping = canonical_mapping(mentions, assignments, canon=entities_f)
    triples = resolve_and_fold_triples(raw_triples, mapping, provenance_cap=provenance_cap)

    # Materialize fold outputs BEFORE the upsert swaps: these plans read the
    # current entity_nodes generation (pseudo-mention lineage), so the swap
    # must not happen under a live plan.  On Iceberg this hazard vanishes
    # (snapshot isolation); on the parquet catalog the stage write is the
    # snapshot.
    cat.write(entities_f, "stage_entities")
    cat.write(triples, "stage_triples")
    entities_f = cat.read("stage_entities")
    triples = cat.read("stage_triples")
    entities = entities_f.drop("component")

    # createdAt/lastUpdated stamps (kuzu_db_handler.py:222,326,420,562):
    # upsert semantics keep the existing createdAt and take the incoming
    # lastUpdated, so untouched rows keep their original stamps.
    now = F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    entities = entities.withColumn("createdAt", now).withColumn("lastUpdated", now)
    triples = triples.withColumn("createdAt", now).withColumn("lastUpdated", now)

    if existing is not None and cat.exists("entity_nodes"):
        # Re-canonicalization: new evidence can merge entities that earlier
        # runs created separately.  Detect components holding >1 existing
        # entity (or an existing entity losing the canonical spot), rename
        # absorbed rows onto the canonical, and rewrite historical triples.
        pseudo = with_node(
            mentions.filter(F.col("existing_name").isNotNull())
        ).select("node", "type", "existing_name")
        canon = entities_f.select("component", F.col("name").alias("canonical"))
        renames = (
            pseudo.join(assignments, "node")
            .join(canon, "component")
            .select("type", F.col("existing_name").alias("old_name"), "canonical")
            .filter(F.col("old_name") != F.col("canonical"))
            .distinct()
        )
        cat.write(renames, "stage_renames")
        renames = cat.read("stage_renames")

        renamed_nodes = apply_renames_to_nodes(cat.read("entity_nodes"), renames)
        cat.write(upsert_entities(renamed_nodes, entities), "entity_nodes")
        if cat.exists("triples"):
            # guard: a kill between the first-run entity write and triple
            # write leaves entity_nodes without triples — resume must not
            # crash on the missing table
            rewritten = apply_renames_to_triples(cat.read("triples"), renames)
            cat.write(upsert_triples(rewritten, triples), "triples")
        else:
            cat.write(triples, "triples")
    else:
        cat.write(entities, "entity_nodes")
        cat.write(triples, "triples")

    if page_permissions is not None:
        # O6: document -> entity/relation permission propagation
        ents = propagate_permissions(
            cat.read("entity_nodes").drop("permissions"),
            page_permissions, ["type", "name"],
        )
        cat.write(ents, "entity_nodes")
        trs = propagate_permissions(
            cat.read("triples").drop("permissions"),
            page_permissions, ["relation_id"],
        )
        cat.write(trs, "triples")

    if embed:
        # deterministic embeddings over text renderings (reference:
        # ollama_embedder.py:53-101), stored in the materialized tables
        from knowledgegraph_spark.functions.embedding import embedding

        ents = cat.read("entity_nodes")
        # rendering includes rawDescriptions, mirroring the reference's
        # description-bearing embedding text (ollama_embedder.py:53-101)
        ents = ents.withColumn(
            "embedding",
            embedding(
                F.concat_ws(
                    " ", "name", "type",
                    F.concat_ws(" ", "aliases"),
                    F.concat_ws(" ", "rawDescriptions"),
                )
            ),
        )
        cat.write(ents, "entity_nodes")
        trs = cat.read("triples")
        trs = trs.withColumn(
            "embedding", embedding(F.concat_ws(" ", "subj", "pred", "obj"))
        )
        cat.write(trs, "triples")

    # Ledger commit LAST: a crash before this line re-processes the pages
    # (idempotent); after it, they are skipped.  Append-only O(delta):
    # todo was already anti-joined against the ledger, so appended urls
    # are new by construction — no whole-ledger rewrite per batch.
    failed_urls = failed.select("url").distinct().withColumn("__failed", F.lit(True))
    ledger = (
        todo.select("url").distinct()
        .join(failed_urls, "url", "left")
        .select(
            "url",
            F.lit(session_id).alias("session_id"),
            F.when(F.col("__failed"), F.lit("failed")).otherwise(F.lit("ok")).alias("status"),
            F.current_timestamp().alias("processed_at"),
        )
    )
    cat.append(ledger, "checkpoint_ledger")
    return cat
