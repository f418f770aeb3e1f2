# Engine image: PySpark driver/executor base with the engine installed.
# Mirrors the deployment role of the reference's consumer Dockerfile
# (reference docker-compose.yml:1-60) — one image serves spark-submit,
# the CLI, and streaming pipelines.
#
# NOTE: authored to standard practice but NOT built in the development
# sandbox (no Docker daemon there); validate with `docker build .` in a
# normal environment.

FROM python:3.11-slim

# Java for the in-process Spark JVM (local mode / driver).
RUN apt-get update \
    && apt-get install -y --no-install-recommends openjdk-17-jre-headless \
    && rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

RUN pip install --no-cache-dir \
    pyspark==4.1.2 pyarrow pandas numpy duckdb pytest hypothesis

WORKDIR /app
COPY real_time_data_anomaly_detection_spark/ real_time_data_anomaly_detection_spark/
COPY __spark_entry__.py bench.py ./
COPY tools/ tools/

ENV PYTHONPATH=/app \
    SPARK_GRAFT_CPUS=4

# Default: run the live detection pipeline against the rate source.
# Override for a Kafka deployment:
#   docker run ... python -m real_time_data_anomaly_detection_spark pipeline --rate 10000
ENTRYPOINT ["python", "-m", "real_time_data_anomaly_detection_spark"]
CMD ["pipeline", "--rate", "1000", "--duration", "3600", "--watch"]
