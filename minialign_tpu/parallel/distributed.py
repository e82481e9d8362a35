"""Multi-host launch support (SURVEY.md §2.6: jax.distributed + per-
host input sharding; the reference has no multi-node anything).

Deployment model: every host runs the same CLI with
`minialign-tpu-dist --coordinator host0:1234 --host-id I --n-hosts N`
semantics via `initialize()`; each host maps its own slice of the
query files (deterministic round-robin of read batches, so the
concatenation of per-host outputs in host order equals the single-host
output order), with the index replicated (small genomes) or
hash-range-sharded over the global mesh (ShardedIndex handles both —
the 'dp' axis spans all hosts' devices once jax.distributed is up).

Only the process-launch part needs real multi-host hardware; the
partitioning logic is pure and unit-tested (tests/test_shard.py).
"""

from __future__ import annotations


def initialize(coordinator: str, n_hosts: int, host_id: int) -> None:
    """Bring up jax.distributed so jax.devices() spans all hosts and
    the mesh collectives ride ICI/DCN. Call before any jax use."""
    import jax

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=n_hosts,
                               process_id=host_id)


def host_batches(batches, host_id: int, n_hosts: int):
    """Deterministic round-robin batch assignment. Yields (global_batch
    rank, batch) for the batches this host owns; emitting each host's
    results ordered by global rank and concatenating host files in
    rank order reproduces the single-host output order exactly (the
    reference's heapq-ordered drain guarantee, minialign.c:4633-4645,
    lifted to hosts)."""
    for rank, batch in enumerate(batches):
        if rank % n_hosts == host_id:
            yield rank, batch


def merge_host_outputs(paths: list, out) -> None:
    """Concatenate per-host record files written as (rank, payload)
    sections back into global order. Each file holds its host's batches
    sorted by rank; a k-way merge by rank restores the global order."""
    import heapq

    streams = []
    for p in paths:
        recs = []
        with open(p) as f:
            rank = None
            buf = []
            for line in f:
                if line.startswith("#batch\t"):
                    if rank is not None:
                        recs.append((rank, "".join(buf)))
                    rank = int(line.split("\t")[1])
                    buf = []
                else:
                    buf.append(line)
            if rank is not None:
                recs.append((rank, "".join(buf)))
        streams.append(recs)
    merged = heapq.merge(*streams, key=lambda r: r[0])
    for _, payload in merged:
        out.write(payload)
