"""Dataflow graph: the engine's pipeline-composition API (reference §3.1).

Reference model: ``bonobo.Graph(Select(...), InsertOrUpdate(...))`` builds a
DAG of nodes that run on threads connected by FIFO queues
(``tests/test_integration.py:173-175, 190-193``). The graph IS the IR; there
is no analysis or rewriting.

Spark-first redesign: a chain of nodes composes **lazily** into a DataFrame
expression — the logical plan is the IR, Catalyst analyzes/rewrites it, and
nothing executes until a sink (or the caller) triggers an action. Thread
boundaries become Catalyst exchange boundaries; a node is one of:

- **source**: ``(spark, services) -> DataFrame`` (e.g. ``Select``), or a
  plain Python generator/iterable of rows (parity with arbitrary-callable
  bonobo sources like ``tests/test_integration.py:130-134``) which becomes
  ``spark.createDataFrame``;
- **transform**: ``DataFrame -> DataFrame`` (arbitrary relational logic);
- **sink**: an object with ``.write(df, spark, services) -> DataFrame``
  (e.g. ``InsertOrUpdate``); the returned DataFrame flows on so chains can
  continue past a sink, mirroring the reference's re-emission of written
  rows downstream (``writers.py:72, 94``).

Multiple chains per graph are supported (``graph.add_chain``); ``run``
executes every chain and returns the terminal DataFrames.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

from ..registry import ServiceRegistry


class NodeExecutionContext:
    """Execution-time context handed to context-aware nodes.

    Parity with bonobo's ``@use_context`` nodes (``readers.py:6``,
    ``writers.py:15``): carries the session, resolved services, and the
    output-field override hook (``set_output_fields`` renames the stream's
    columns, the analog of ``readers.py:73-74``).
    """

    def __init__(self, spark: SparkSession, services: ServiceRegistry) -> None:
        self.spark = spark
        self.services = services
        self._output_fields: list[str] | None = None

    def set_output_fields(self, fields: Iterable[str]) -> None:
        self._output_fields = list(fields)

    def apply_output_fields(self, df: DataFrame) -> DataFrame:
        if self._output_fields:
            df = df.toDF(*self._output_fields)
        return df


class Producer:
    """A generator/iterable source with declared output field names.

    Parity with bonobo sources that call ``context.set_output_fields``
    (``readers.py:73-74``) or rely on the stream's declared schema: bare
    tuples from a Python generator have no names, so a sink keyed on column
    names (e.g. ``InsertOrUpdate``'s discriminant) needs them declared.

    Usage: ``Graph(producer(extract, fields=("id", "value")), sink)`` or
    yield dicts/Rows from the generator and skip the declaration.
    """

    def __init__(self, fn, fields: Iterable[str] | None = None) -> None:
        self.fn = fn
        self.fields = tuple(fields) if fields else None

    def __call__(self):
        return self.fn() if callable(self.fn) else self.fn


def producer(fn=None, *, fields: Iterable[str] | None = None):
    """Wrap a zero-arg generator (or iterable) with declared field names."""
    if fn is None:
        return lambda f: Producer(f, fields)
    return Producer(fn, fields)


class Graph:
    """A DAG of chains. ``Graph(a, b, c)`` is one chain a -> b -> c.

    ``add_chain(d, _input=a)`` forks: if ``a`` is a node of an
    already-added chain, the new chain consumes ``a``'s OUTPUT stream —
    bonobo's fork semantics (one producer feeding several downstream
    chains). In Spark terms both consumers share ``a``'s logical plan
    subtree, so the fork costs nothing at plan time and Catalyst/AQE reuse
    the exchange where possible. If ``a`` is not part of any prior chain it
    is simply prepended as the new chain's source (the pre-fork behavior).
    """

    def __init__(self, *nodes: Any) -> None:
        #: (nodes, input_ref) per chain; input_ref is the fork point or None.
        self.chains: list[list[Any]] = []
        self._inputs: list[Any] = []
        if nodes:
            self.add_chain(*nodes)

    def add_chain(self, *nodes: Any, _input: Any = None) -> "Graph":
        chain = list(nodes)
        input_ref = None
        if _input is not None:
            if any(any(n is _input for n in c) for c in self.chains):
                input_ref = _input  # fork off an existing node's output
            else:
                chain.insert(0, _input)
        self.chains.append(chain)
        self._inputs.append(input_ref)
        return self

    def __len__(self) -> int:
        # distinct node count: a fork's input node already lives (and is
        # counted) in the chain it was first added to
        return sum(len(c) for c in self.chains)

    def _chain_inputs(self) -> list:
        """(input_ref or None) per chain, padded: bonobo-style code that
        appends to ``.chains`` directly never touches ``_inputs``, and a
        short zip would silently SKIP those chains — pad so every chain
        executes."""
        pad = len(self.chains) - len(self._inputs)
        return list(self._inputs) + [None] * max(0, pad)


def _materialize_source(
    node: Any, spark: SparkSession, services: ServiceRegistry, ctx: NodeExecutionContext
) -> DataFrame:
    if isinstance(node, DataFrame):
        return node
    if isinstance(node, Producer):
        if node.fields:
            ctx.set_output_fields(node.fields)
        node = node()
    elif callable(node):
        sig = None
        try:
            sig = inspect.signature(node)
        except (TypeError, ValueError):
            pass
        if sig is not None and len(sig.parameters) == 0:
            node = node()  # zero-arg generator/factory -> rows or DataFrame
        else:
            try:
                return node(spark, services)
            except TypeError:
                return node(spark)
    if isinstance(node, DataFrame):
        return node
    # Iterable of rows (tuples/dicts/Rows) -> DataFrame; schema from data.
    rows = list(node)
    df = spark.createDataFrame(rows)
    return ctx.apply_output_fields(df)


def _apply_node(
    node: Any,
    df: DataFrame,
    spark: SparkSession,
    services: ServiceRegistry,
    ctx: NodeExecutionContext,
) -> DataFrame:
    write = getattr(node, "write", None)
    if callable(write):  # sink
        return write(df, spark, services)
    if callable(node):
        # Arity by signature inspection (like _materialize_source), not by
        # catch-and-retry: a genuine TypeError raised *inside* a one-arg
        # transform must propagate, not be masked by a confusing second
        # call with (df, ctx).
        try:
            sig = inspect.signature(node)
            n_required = sum(
                1
                for p in sig.parameters.values()
                if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
                and p.default is p.empty
            )
        except (TypeError, ValueError):
            n_required = 1
        return node(df, ctx) if n_required >= 2 else node(df)
    raise TypeError(f"node {node!r} is neither callable nor a sink")


def run(
    graph: Graph | Any,
    spark: SparkSession | None = None,
    services: dict[str, Any] | ServiceRegistry | None = None,
) -> list[DataFrame]:
    """Execute every chain; returns the terminal DataFrame of each chain.

    Parity with ``bonobo.run(graph, services=...)``
    (``tests/test_integration.py:171-175``): services are resolved by name.
    Truthiness of the returned list mirrors the reference's truthy return on
    success (asserted at ``tests/test_integration.py:175``).
    """
    if spark is None:
        from ..session import get_spark

        spark = get_spark()
    registry = (
        services if isinstance(services, ServiceRegistry) else ServiceRegistry(services or {})
    )
    if not isinstance(graph, Graph):
        graph = Graph(graph)

    results: list[DataFrame] = []
    # id(node) -> that node's output stream. First occurrence wins
    # (_record_output), and forking off a node that occurs in several chains
    # raises rather than silently picking one — see _resolve_fork.
    outputs: dict[int, DataFrame] = {}
    counts: dict[int, int] = {}
    for chain, input_ref in zip(graph.chains, graph._chain_inputs()):
        ctx = NodeExecutionContext(spark, registry)
        if input_ref is not None:
            # fork: consume the recorded node's output (already evaluated —
            # chains run in add order and forks may only reference earlier
            # chains' nodes)
            df = _resolve_fork(input_ref, outputs, counts)
            nodes = chain
        else:
            head, *nodes = chain
            df = _materialize_source(head, spark, registry, ctx)
            _record_output(head, df, outputs, counts)
        for node in nodes:
            df = _apply_node(node, df, spark, registry, ctx)
            _record_output(node, df, outputs, counts)
        results.append(df)
    return results


def _record_output(node: Any, df: DataFrame, outputs: dict, counts: dict) -> None:
    """Record a node's output stream, first occurrence wins.

    A node object reused across chains used to OVERWRITE its earlier output,
    so a later fork silently consumed the wrong occurrence; now the first
    occurrence is kept and ambiguous forks raise (see :func:`_resolve_fork`).
    """
    counts[id(node)] = counts.get(id(node), 0) + 1
    outputs.setdefault(id(node), df)


def _resolve_fork(input_ref: Any, outputs: dict, counts: dict) -> DataFrame:
    if id(input_ref) not in outputs:
        raise ValueError(
            f"fork input {input_ref!r} has not produced output yet; "
            "add_chain order must put the producer chain first"
        )
    if counts.get(id(input_ref), 0) > 1:
        raise ValueError(
            f"fork input {input_ref!r} appears in multiple chains; which "
            "occurrence to fork from is ambiguous — use a distinct node "
            "object (e.g. functools.partial or a copy) per chain"
        )
    return outputs[id(input_ref)]


def run_observed(
    graph: Graph | Any,
    spark: SparkSession | None = None,
    services: dict[str, Any] | ServiceRegistry | None = None,
):
    """:func:`run` + per-node row counters — bonobo's console node stats
    (``Select in=1 out=10 [done]``), re-expressed Spark-first.

    bonobo counts rows as they cross each queue at execution time; the
    Spark analog is ``DataFrame.observe`` (CollectMetrics): each node's
    output stream gets a named metrics collector INSIDE the plan, so the
    counters ride the same job that materializes the chain — no extra
    actions, no recomputation, exact counts at any scale.

    Returns ``(results, stats)`` where ``stats`` maps ``"c{i}/n{j}:{label}"``
    to a :class:`pyspark.sql.Observation`. Counters resolve after the
    caller runs an action on the corresponding chain's terminal DataFrame
    (``obs.get["rows"]`` blocks until then). Sinks count rows *emitted
    downstream* (the re-emission stream), matching bonobo's out-counter.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    if spark is None:
        from ..session import get_spark

        spark = get_spark()
    registry = (
        services if isinstance(services, ServiceRegistry) else ServiceRegistry(services or {})
    )
    if not isinstance(graph, Graph):
        graph = Graph(graph)

    def label_of(node: Any) -> str:
        for attr in ("__name__",):
            if hasattr(node, attr):
                return getattr(node, attr)
        return type(node).__name__

    results: list[DataFrame] = []
    stats: dict[str, "Observation"] = {}
    outputs: dict[int, DataFrame] = {}
    counts: dict[int, int] = {}
    for ci, (chain, input_ref) in enumerate(zip(graph.chains, graph._chain_inputs())):
        ctx = NodeExecutionContext(spark, registry)
        if input_ref is not None:
            df = _resolve_fork(input_ref, outputs, counts)
            nodes = chain
            offset = 0
        else:
            head, *nodes = chain
            df = _materialize_source(head, spark, registry, ctx)
            obs = Observation()
            df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
            stats[f"c{ci}/n0:{label_of(head)}"] = obs
            _record_output(head, df, outputs, counts)
            offset = 1
        for ni, node in enumerate(nodes):
            df = _apply_node(node, df, spark, registry, ctx)
            obs = Observation()
            df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
            stats[f"c{ci}/n{ni + offset}:{label_of(node)}"] = obs
            _record_output(node, df, outputs, counts)
        results.append(df)
    return results, stats
