#!/usr/bin/env bash
# Fetch the iceberg-spark-runtime jar matching the installed PySpark
# (4.1.x ⇒ runtime-4.0_2.13 line) into ./jars/ so that
# tests/test_iceberg_runtime.py stops skipping and executes the real
# catalog round trip (tools/iceberg_roundtrip.py).
#
# This sandbox has NO outbound network (DNS resolution fails — probe
# recorded in TESTDATA.md §"Iceberg runtime availability"), so here this
# script fails fast with that diagnosis; on any networked box it works
# as-is. Alternative: drop any iceberg-spark-runtime-*.jar into ./jars/
# or export ICEBERG_SPARK_RUNTIME_JAR=/path/to/jar.
set -euo pipefail

VERSION="${ICEBERG_VERSION:-1.10.0}"
SPARK_LINE="${ICEBERG_SPARK_LINE:-4.0}"   # runtime line for Spark 4.x
SCALA="2.13"
ART="iceberg-spark-runtime-${SPARK_LINE}_${SCALA}"
URL="https://repo1.maven.org/maven2/org/apache/iceberg/${ART}/${VERSION}/${ART}-${VERSION}.jar"

DEST_DIR="$(cd "$(dirname "$0")/.." && pwd)/jars"
mkdir -p "$DEST_DIR"
DEST="$DEST_DIR/${ART}-${VERSION}.jar"

echo "fetching $URL -> $DEST"
if ! curl -fSL --retry 3 -o "$DEST.part" "$URL"; then
  echo "FETCH FAILED. If this is the offline sandbox: expected —" >&2
  echo "DNS is unavailable (curl exit 6 on repo1.maven.org, verified" >&2
  echo "2026-08-21; see TESTDATA.md). Provide the jar out-of-band via" >&2
  echo "ICEBERG_SPARK_RUNTIME_JAR or ./jars/ instead." >&2
  rm -f "$DEST.part"
  exit 1
fi
mv "$DEST.part" "$DEST"
echo "ok: $DEST"
echo "now run: python -m pytest tests/test_iceberg_runtime.py -v"
