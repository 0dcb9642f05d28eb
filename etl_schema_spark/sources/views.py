"""View catalog: templated SQL views materialized in dependency order.

Parity: cmd/bq_create_view/main.go + views/create_view_lib.sh — the
reference's deployment tool:

  - substitutes Go-template refs (``{{.ProjectID}}``) into each view's SQL
    (main.go: template.Must(template.New(...)), create_view_lib.sh)
  - extracts referenced tables with a backtick-qualified regex
    (main.go findTables, lines 43-56)
  - creates/replaces each view with a description stamped with provenance
    (main.go: description + "View of data table ...")
  - attaches per-dataset access-control manifests (acl/*.acl.json — the
    reference ships BigQuery dataset ACL JSON per visibility tier)

Here a ViewCatalog holds named SQL templates; ``materialize`` resolves
``{{.ProjectID}}.dataset.name`` references, topologically orders views by
their dependencies, and registers each as a Spark temp view. On a cluster
the same definitions materialize as Unity/HMS views via ``CREATE OR REPLACE
VIEW`` — the DAG logic is identical.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# matches `{{.ProjectID}}.dataset.table` and `proj.dataset.table` refs,
# parity with findTables (cmd/bq_create_view/main.go:43-56)
_REF_RE = re.compile(r"`([A-Za-z0-9_{}.\-]+)\.([A-Za-z0-9_-]+)\.([A-Za-z0-9_-]+)`")


@dataclass
class ViewDef:
    name: str  # dataset.view
    sql_template: str  # may reference `{{.ProjectID}}.dataset.table`
    description: str = ""


# Dataset ACL manifest shapes, parity with the reference's acl/ directory
# (BigQuery dataset-ACL JSON: role + specialGroup entries).
PRIVATE_ACL = {
    "access": [
        {"role": "WRITER", "specialGroup": "projectWriters"},
        {"role": "OWNER", "specialGroup": "projectOwners"},
    ],
    "kind": "dataset",
}
PUBLIC_ACL = {
    "access": [
        {"role": "READER", "specialGroup": "allAuthenticatedUsers"},
        {"role": "WRITER", "specialGroup": "projectWriters"},
        {"role": "OWNER", "specialGroup": "projectOwners"},
    ],
    "kind": "dataset",
}


@dataclass
class ViewCatalog:
    project_id: str = "local"
    views: dict[str, ViewDef] = field(default_factory=dict)
    descriptions: dict[str, str] = field(default_factory=dict)
    acls: dict[str, dict] = field(default_factory=dict)  # dataset -> manifest

    def add(self, name: str, sql_template: str, description: str = "") -> None:
        self.views[name] = ViewDef(name, sql_template, description)

    def set_acl(self, dataset: str, manifest: dict) -> None:
        """Attach an access-control manifest to a dataset (every view under
        ``dataset.*`` inherits it). Manifest shape mirrors acl/*.acl.json."""
        entries = manifest.get("access")
        if not isinstance(entries, list) or not all(
            isinstance(e, dict) and "role" in e for e in entries
        ):
            raise ValueError("ACL manifest needs an 'access' list of role entries")
        self.acls[dataset] = manifest

    def acl_for(self, view_name: str) -> dict:
        """The effective ACL of a view: its dataset's manifest, defaulting
        to PRIVATE (the reference's private.acl.json is the fallback)."""
        dataset = view_name.split(".", 1)[0]
        return self.acls.get(dataset, PRIVATE_ACL)

    @staticmethod
    def find_refs(sql: str) -> list[str]:
        """Extract `project.dataset.table` references (findTables parity)."""
        return [f"{m[1]}.{m[2]}" for m in _REF_RE.findall(sql)]

    def render(self, name: str) -> str:
        """Template substitution ({{.ProjectID}} → project) and reference
        flattening to Spark temp-view names (dataset_view)."""
        sql = self.views[name].sql_template.replace("{{.ProjectID}}", self.project_id)

        def repl(m: re.Match) -> str:
            return self._spark_name(f"{m[2]}.{m[3]}")

        return _REF_RE.sub(lambda m: repl(m), sql)

    @staticmethod
    def _spark_name(name: str) -> str:
        return name.replace(".", "__")

    def dependency_order(self) -> list[str]:
        """Topological order over intra-catalog references; external tables
        (not defined here) are assumed pre-registered."""
        deps: dict[str, set[str]] = {}
        for name, v in self.views.items():
            refs = set(self.find_refs(v.sql_template))
            deps[name] = {r for r in refs if r in self.views}
        ordered: list[str] = []
        seen: set[str] = set()
        visiting: set[str] = set()

        def visit(n: str) -> None:
            if n in seen:
                return
            if n in visiting:
                raise ValueError(f"view dependency cycle at {n!r}")
            visiting.add(n)
            for d in sorted(deps[n]):
                visit(d)
            visiting.discard(n)
            seen.add(n)
            ordered.append(n)

        for n in sorted(self.views):
            visit(n)
        return ordered

    def materialize(self, spark: SparkSession) -> list[str]:
        """Create every view as a Spark temp view in dependency order.
        Returns the creation order. Descriptions are stamped with the
        provenance suffix the reference uses (main.go: 'View of data
        table...')."""
        order = self.dependency_order()
        for name in order:
            v = self.views[name]
            df = spark.sql(self.render(name))
            df.createOrReplaceTempView(self._spark_name(name))
            refs = ", ".join(self.find_refs(v.sql_template)) or "(none)"
            self.descriptions[name] = (
                f"{v.description}\nView of {refs}. Created by etl_schema_spark."
            ).strip()
        return order

    def query(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.table(self._spark_name(name))
