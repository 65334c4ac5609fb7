"""Pipeline nodes.

Every node is a function ``run(state: State, config: Config=...) -> StateDelta``
(bound into the DAG via ``functools.partial`` when a non-default config is
needed).  Nodes read the state snapshot, do host I/O and device compute, and
return only the keys they produce — the scheduler merges deltas
last-writer-wins (see fvd_tpu.state).
"""
