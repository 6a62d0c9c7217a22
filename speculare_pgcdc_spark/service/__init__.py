"""Non-Spark service shell: the thin sidecar layer between the engine's
outbox contract and live clients (reference analog: src/api/)."""
