"""Config resolution (C1) — reference-compatible parameter surface.

The reference merges CLI args with Kinesis-Data-Analytics runtime
properties, properties winning (reference: utils/ParameterToolUtils.java:28-50,
group ``FlinkApplicationProperties``). We mirror that: CLI ``--Key value``
pairs merged with an application-properties dict; properties win.

Recognized keys keep the reference's exact names — including the
``InputStreamInitalPosition`` typo (reference: StreamingEtl.java:158) — plus
engine extensions for the file/rate test sources.
"""

from __future__ import annotations

from dataclasses import dataclass, field

#: Reference parameter names (StreamingEtl.java:87-147,156-217,243-278).
KNOWN_KEYS = {
    # sources
    "InputKinesisStream",
    "InputStreamRegion",
    "InputStreamInitalPosition",  # sic — reference typo kept for parity
    "InputKafkaBootstrapServers",
    "InputKafkaTopic",
    # engine extensions (testable sources without AWS/Kafka infra)
    "InputFilePath",
    "InputFileFormat",
    "InputRateRowsPerSecond",
    "InputMaxRecordsPerBatch",  # replay-source per-trigger cap (Kinesis twin)
    "InputMaxOffsetsPerTrigger",  # replay-source per-trigger cap (Kafka twin)
    "InputAvailableNowSnapshot",  # capped-backfill snapshot drain (auto under availableNow)
    # sinks
    "OutputBucket",
    "OutputPrefix",
    "ParquetConversion",
    "OutputElasticsearchEndpoint",
    "ElasticsearchRegion",
    "ElasticsearchBulkFlushMaxSizeMb",
    "ElasticsearchBulkFlushMaxActions",
    "ElasticsearchBulkFlushInterval",
    "OutputKinesisStream",
    "OutputStreamRegion",
    "OutputKafkaBootstrapServers",
    "OutputKafkaTopic",
    "OutputDiscarding",
    # engine
    "CheckpointLocation",
    "TriggerInterval",
}


class ConfigError(RuntimeError):
    """Raised for invalid pipeline configuration (mirrors the reference's
    config-time RuntimeException, StreamingEtl.java:88,102,148)."""


@dataclass
class JobConfig:
    params: dict[str, str] = field(default_factory=dict)

    def has(self, key: str) -> bool:
        return key in self.params

    def get(self, key: str, default: str | None = None) -> str | None:
        return self.params.get(key, default)

    def get_required(self, key: str) -> str:
        if key not in self.params:
            raise ConfigError(f"Missing required parameter: {key}")
        return self.params[key]

    def get_bool(self, key: str, default: bool = False) -> bool:
        v = self.params.get(key)
        if v is None:
            return default
        return v.strip().lower() in ("true", "1", "yes")


def from_args_and_properties(
    args: list[str] | None = None,
    application_properties: dict[str, str] | None = None,
) -> JobConfig:
    """Merge ``--Key value`` CLI args with application properties.

    Properties override args — same precedence as the reference
    (ParameterToolUtils.java:44-47 merges properties over the arg tool).
    """
    params: dict[str, str] = {}
    argv = list(args or [])
    i = 0
    while i < len(argv):
        tok = argv[i]
        if tok.startswith("--"):
            key = tok[2:]
            if i + 1 < len(argv) and not argv[i + 1].startswith("--"):
                params[key] = argv[i + 1]
                i += 2
            else:
                params[key] = "true"
                i += 1
        else:
            i += 1
    params.update(application_properties or {})
    return JobConfig(params=params)
