"""Structured Streaming layer (SURVEY §2B S4/S5/T1-T7, §3 EP2/EP3).

The reference is a streaming dataflow: WAL source -> decode -> explode ->
filter -> route -> per-client fan-out, with LSN checkpoints. Here each
piece maps onto Structured Streaming:

- source: file-based change feed for tests (cdc/feedgen fixtures);
  the production design for real PostgreSQL is a JDBC change-feed poll
  (monotonic cursor column == the LSN analog) documented in source.py.
- offsets/LSN: the checkpointLocation offset+commit log IS the
  reference's standby-status-update contract (at-least-once: offsets
  commit only after a microbatch completes, replication.rs:198-203).
- routing/fan-out: stream-static broadcast join against the
  subscriptions frame + foreachBatch writer keyed by sub_id.
- supervision: restart-from-checkpoint replaces the Bastion supervisor
  (main.rs:72-86) — pinned by the restart behavior test.
"""
