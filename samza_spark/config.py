"""Samza ``.properties`` job-config compatibility layer.

A Samza user's deployment artifact IS a properties file (job.name,
task.inputs, systems.<name>.samza.factory, streams.<id>.*, stores.*,
serializers.* — reference key model: samza-core/.../config/JobConfig,
TaskConfig, SystemConfig, StorageConfig; examples under
samza-test/src/main/config/). This module parses that format and
resolves it onto the engine's descriptor/table objects so an existing
config ports without rewriting:

- ``systems.<s>.samza.factory`` picks the source class (Kafka, in-memory,
  HDFS/file, EventHubs, Kinesis);
- ``task.inputs`` (``system.stream`` or a ``streams.<id>`` alias) becomes
  source descriptors; ``streams.<id>.samza.physical.name`` indirection is
  honored;
- ``systems.<s>.samza.offset.default`` (oldest/upcoming) maps to the
  Startpoint model;
- ``stores.<name>.factory`` builds a LocalTable (in-memory factory) or a
  DurableLocalTable (RocksDB factory; ``changelog`` enables the durable
  changelog+snapshot path);
- ``task.window.ms`` surfaces as the processing-time trigger interval.

Cluster-manager keys (yarn.*, job.coordinator.*, job.factory.class) are
accepted and ignored: Spark owns scheduling and coordination.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping


def parse_properties(text: str) -> dict:
    """Java ``.properties`` parser: ``#``/``!`` comments, ``key=value`` or
    ``key: value``, backslash line continuations, whitespace trimming."""
    props: dict = {}
    pending = ""
    for raw in text.splitlines():
        line = pending + raw.strip()
        pending = ""
        if not line or line.lstrip().startswith(("#", "!")):
            continue
        if line.endswith("\\") and not line.endswith("\\\\"):
            pending = line[:-1]
            continue
        for sep in ("=", ":"):
            i = line.find(sep)
            if i >= 0:
                props[line[:i].strip()] = line[i + 1 :].strip()
                break
        else:
            props[line.strip()] = ""
    return props


_FACTORY_KINDS = {
    "KafkaSystemFactory": "kafka",
    "InMemorySystemFactory": "memory",
    "HdfsSystemFactory": "file",
    "EventHubSystemFactory": "eventhubs",
    "KinesisSystemFactory": "kinesis",
    # engine-native replayable partitioned log (sources/log_datasource.py)
    "SamzaLogSystemFactory": "samzalog",
}


@dataclass
class JobConfig:
    """Resolved view over a parsed Samza properties map."""

    props: Mapping
    _streams: dict = field(default_factory=dict, repr=False)

    @classmethod
    def from_text(cls, text: str) -> "JobConfig":
        return cls(parse_properties(text))

    @classmethod
    def from_file(cls, path: str) -> "JobConfig":
        with open(path, encoding="utf-8") as f:
            return cls(parse_properties(f.read()))

    # -- basic job identity ------------------------------------------------
    @property
    def job_name(self) -> str:
        return self.props.get("job.name") or self.props.get("app.name") or "samza-job"

    @property
    def window_ms(self) -> "int | None":
        v = self.props.get("task.window.ms")
        return int(v) if v not in (None, "") else None

    @property
    def max_messages(self) -> "int | None":
        v = self.props.get("task.max.messages")
        return int(v) if v not in (None, "") else None

    # -- systems -----------------------------------------------------------
    def _sub(self, prefix: str) -> dict:
        plen = len(prefix)
        return {k[plen:]: v for k, v in self.props.items() if k.startswith(prefix)}

    def system_kind(self, system: str) -> str:
        factory = self.props.get(f"systems.{system}.samza.factory", "")
        cls_name = factory.rsplit(".", 1)[-1]
        kind = _FACTORY_KINDS.get(cls_name)
        if kind is None:
            raise ValueError(
                f"system {system!r}: unknown factory {factory!r} "
                f"(supported: {sorted(set(_FACTORY_KINDS.values()))})"
            )
        return kind

    def startpoint(self, system: str):
        from samza_spark.sources.descriptors import Startpoint

        # SystemConfig samza.offset.default: upcoming (default) | oldest
        v = self.props.get(f"systems.{system}.samza.offset.default", "upcoming")
        return Startpoint(mode="oldest" if v == "oldest" else "upcoming")

    # -- streams -----------------------------------------------------------
    def resolve_input(self, spec: str) -> "tuple[str, str]":
        """``task.inputs`` entry -> (system, physical stream). Accepts the
        ``system.stream`` form and the ``streams.<id>.*`` alias form."""
        sid = spec.strip()
        sys_key = self.props.get(f"streams.{sid}.samza.system")
        if sys_key:  # stream-id alias
            physical = self.props.get(f"streams.{sid}.samza.physical.name", sid)
            return sys_key, physical
        if "." in sid:
            system, stream = sid.split(".", 1)
            return system, stream
        raise ValueError(f"cannot resolve input {spec!r}: no streams.{sid}.* and no system prefix")

    def task_inputs(self) -> "list[tuple[str, str]]":
        v = self.props.get("task.inputs", "")
        return [self.resolve_input(s) for s in v.split(",") if s.strip()]

    def task_outputs(self) -> "list[tuple[str, str]]":
        v = self.props.get("task.outputs", "")
        return [self.resolve_input(s) for s in v.split(",") if s.strip()]

    # -- descriptor construction -------------------------------------------
    def build_source(self, system: str, stream: str, memory_streams: "Mapping | None" = None):
        from samza_spark.sources.descriptors import (
            EventHubsSource,
            FileSource,
            KafkaSource,
            KinesisSource,
        )

        kind = self.system_kind(system)
        if kind == "kafka":
            servers = (
                self.props.get(f"systems.{system}.consumer.bootstrap.servers")
                or self.props.get(f"systems.{system}.producer.bootstrap.servers")
                or "localhost:9092"
            )
            return KafkaSource(
                topic=stream, bootstrap_servers=servers, startpoint=self.startpoint(system)
            )
        if kind == "memory":
            # the TestRunner shape: in-memory stream content is supplied by
            # the harness (addInputStream), the config only names it
            if memory_streams and stream in memory_streams:
                return memory_streams[stream]
            raise ValueError(
                f"in-memory stream {stream!r} not provided "
                f"(pass memory_streams={{'{stream}': MemorySource(rows, schema)}})"
            )
        if kind == "file":
            root = self.props.get(f"systems.{system}.stagingDirectory", "")
            path = f"{root.rstrip('/')}/{stream}" if root else stream
            fmt = self.props.get(f"streams.{stream}.samza.format", "parquet")
            return FileSource(path=path, fmt=fmt)
        if kind == "eventhubs":
            ns = self.props.get(f"systems.{system}.eventhubs.namespace", system)
            return EventHubsSource(
                topic=stream,
                bootstrap_servers=f"{ns}.servicebus.windows.net:9093",
                startpoint=self.startpoint(system),
            )
        if kind == "samzalog":
            from samza_spark.sources.descriptors import SamzaLogSource

            root = self.props.get(f"systems.{system}.stagingDirectory", "")
            path = (
                self.props.get(f"streams.{stream}.samza.path")
                or (f"{root.rstrip('/')}/{stream}" if root else stream)
            )
            return SamzaLogSource(
                path=path, startpoint=self.startpoint(system).mode
            )
        if kind == "kinesis":
            region = self.props.get(
                f"systems.{system}.aws.region",
                self.props.get(f"systems.{system}.streams.{stream}.aws.region", "us-east-1"),
            )
            return KinesisSource(stream=stream, region=region)
        raise AssertionError(kind)

    def build_sources(self, memory_streams: "Mapping | None" = None) -> dict:
        return {
            f"{s}.{t}": self.build_source(s, t, memory_streams)
            for s, t in self.task_inputs()
        }

    # -- stores ------------------------------------------------------------
    def store_names(self) -> "list[str]":
        names = set()
        for k in self.props:
            if k.startswith("stores."):
                names.add(k.split(".", 2)[1])
        return sorted(names)

    def build_store(self, spark, name: str, schema: str, key_cols, base_dir: str):
        """StorageConfig mapping: RocksDb factory (or any factory plus a
        ``changelog``) -> DurableLocalTable rooted under ``base_dir``;
        in-memory factory without changelog -> plain LocalTable."""
        from samza_spark.tables.local import DurableLocalTable, LocalTable

        factory = self.props.get(f"stores.{name}.factory", "")
        changelog = self.props.get(f"stores.{name}.changelog")
        durable = "RocksDb" in factory or bool(changelog)
        empty = spark.createDataFrame([], schema)
        if durable:
            return DurableLocalTable.open(
                spark, f"{base_dir}/{name}", key_cols, schema=schema
            )
        return LocalTable(empty, key_cols)


def _env_rewrite(props: dict, env: "Mapping[str, str]") -> dict:
    """EnvironmentConfigRewriter.java:51-75: every ``SAMZA_FOO_BAR=baz``
    environment variable becomes ``foo.bar=baz``, overriding the file
    value (prefix stripped, downcased, underscores -> dots)."""
    out = dict(props)
    for k, v in env.items():
        if k.startswith("SAMZA_") and len(k) > len("SAMZA_"):
            out[k[len("SAMZA_"):].lower().replace("_", ".")] = v
    return out


def apply_rewriters(cfg: "JobConfig", env: "Mapping[str, str] | None" = None) -> "JobConfig":
    """ConfigRewriter chain (JobConfig.java:44-50: ``job.config.rewriters``
    is a CSV of names, each resolved through
    ``job.config.rewriter.<name>.class``) — JobRunner applies the chain
    before submitting; :func:`samza_spark.run_app.run_job` does the same.

    Supported classes: the reference's EnvironmentConfigRewriter (by
    class-name suffix), and the Python-native form ``module:callable``
    where the callable receives ``(name, props_dict)`` and returns the
    rewritten dict."""
    import importlib
    import os as _os

    names = [
        n.strip()
        for n in cfg.props.get("job.config.rewriters", "").split(",")
        if n.strip()
    ]
    if not names:
        return cfg
    props = dict(cfg.props)
    for name in names:
        klass = props.get(f"job.config.rewriter.{name}.class", "")
        if klass.rsplit(".", 1)[-1] == "EnvironmentConfigRewriter":
            props = _env_rewrite(props, env if env is not None else _os.environ)
        elif ":" in klass:
            mod, _, attr = klass.partition(":")
            props = getattr(importlib.import_module(mod), attr)(name, props)
        else:
            raise ValueError(
                f"unsupported config rewriter {name!r} -> {klass!r} "
                "(EnvironmentConfigRewriter or 'module:callable')"
            )
    return JobConfig(props)
