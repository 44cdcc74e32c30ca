"""Pipeline configuration.

Analog of the reference's env-var ``Config`` class (reference
``config.py:4-30``) as a frozen dataclass: every tunable the stages and
heuristics read lives here so the oracle and the Ray pipeline share one
set of constants (byte-identity depends on it).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- ingest predicates (reference main.py:102-121) ---
    # size cap; reference default 50 MB (config.py:20). Tests lower it.
    max_payload_bytes: int = 50 * 1024 * 1024

    # --- HTML boilerplate heuristics (M17; north-star DOM heuristics).
    # Frozen constants: the oracle and the pipeline must agree byte-for-byte.
    html_min_block_chars: int = 25      # min normalized text length for a text block
    html_min_heading_chars: int = 3     # headings are kept at much shorter lengths
    html_max_link_density: float = 0.4  # prune blocks whose link-text ratio exceeds this
    html_min_text_density: float = 8.0  # text_len / (1 + descendant_tag_count)

    # --- re-pagination (M12; reference pdf_extractor.py:420) ---
    lines_per_page: int = 50

    # --- PDF-branch actor pool (A1; reference builds one global converter,
    #     main.py:50 — here one warm converter per actor). NOTE: Ray
    #     fuses the upstream sniff/HTML task stage into this actor pool,
    #     so the pool size effectively bounds the WHOLE extraction's
    #     parallelism — benchmarks size it cpus-4, fixed (min==max), to
    #     avoid autoscaler ramp-up inside the measurement ---
    pdf_pool_min: int = 2
    pdf_pool_max: int = 8
    # None = whole block per call. The fused chain re-batches to the
    # SMALLEST stage batch size; 64-row slices of nested Arrow arrays
    # cost ~35% throughput at bench scale, so the default processes
    # whole blocks and leaves skew control to block sizing (read
    # override_num_blocks / target_max_block_size) + the explicit
    # size-bucket path (pipelines.extract.split_by_size)
    pdf_batch_size: int | None = None
    # batch size for the big-payload bucket (skew defusal, SURVEY §4.3)
    pdf_big_batch_size: int = 4
    # payloads at or above this many bytes ride in the small-batch bucket
    big_payload_bytes: int = 1 * 1024 * 1024

    # --- sniff/HTML stage ---
    sniff_batch_size: int | None = None

    # --- execution mode ---
    # 'actor_pool' (default): the north-star structure — PDF conversion
    #   on a map_batches actor pool with converter state warm in
    #   __init__ (one copy per actor).
    # 'tasks': the whole extraction as ONE stateless-task stage with
    #   the converter warm in a worker-process global (same
    #   load-once-per-worker amortization, elastic task scheduling; on
    #   this single-node sandbox it measured ~+60% throughput at 32
    #   CPUs because tasks avoid per-execution actor-pool spin-up and
    #   scheduling).
    execution_mode: str = "actor_pool"

    # --- partitioned runner / lineage ---
    # max input shards processed concurrently by the resumable runner
    partition_concurrency: int = 2

    # --- dedup ---
    dedup_urls: bool = False            # defensive exact dedup by url (SURVEY §2.7)

    def with_(self, **kw) -> "PipelineConfig":
        from dataclasses import replace

        return replace(self, **kw)


DEFAULT_CONFIG = PipelineConfig()
