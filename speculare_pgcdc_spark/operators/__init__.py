"""Custom operators Spark lacks as built-ins, composed from DataFrame ops.

Design rule (SURVEY §7): (a) composition of existing ops when semantics
allow; (b) Arrow-batched applyInPandas when they don't; (c) mapPartitions
never so far.
"""
