"""mq_to_db_ray — a Ray-Data-native streaming ingest → rollup → retention engine.

Re-expresses the dataflow of christiangda/mq-to-db (a Go RabbitMQ→PostgreSQL
ingest service: source → fan-out consumers → merge → fan-out stateful workers
→ parse → validate → execute → ack/reject → observe) as a Ray Data pipeline
over Parquet tables of pre-tokenized training sequences:

    read_parquet (epoch)                 # reference: RMQ.Consume fan-out
      → map_batches(validate)           # reference: messages.NewSQL / ValidDataConn
      → map_batches(assign_time)        # event time derived from per-source seq
      → raw-tier retention write        # tokens never shuffled past this point
      → two-phase salted rollup (1m)    # reference: per-worker counters merged
      → cascade 1m→1h→1d                # chained groupby.aggregate
      → gap-fill + DoD/Gorilla encode   # per-source map_groups, actor pool
      → staged commit + manifest        # reference: Ack()-after-store, ack-once

Reference parity notes cite /root/reference file:line in module docstrings.
No code is copied from the reference (it is Go; this is a from-scratch Ray
Data design).
"""

__version__ = "0.1.0"
