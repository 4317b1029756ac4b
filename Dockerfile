# graft — Spark-native analytics engine, containerized.
#
# Deployment parity with the reference's Docker layer
# (reference/Dockerfile:1-26, docker-compose.yml:1-60): one image that
# carries the engine plus its runtime, orchestrated by compose into a
# small Spark standalone cluster with the operational entry points
# (pipeline / health / backup / restore / retention / bench / verify)
# exposed as one-command services.
#
# Two-stage build: stage 1 compiles the thin application jar with sbt —
# the engine has NO dependencies beyond Spark itself (provided by the
# runtime image, whose jars are copied into the build stage), so
# `sbt package` — not an assembly — is the whole build. Stage 2 layers
# the jar and the entrypoint onto the official Spark runtime image.
#
# Pin SPARK_IMAGE to the exact Spark/Scala line the repo builds against
# (Spark 4.x, Scala 2.13, Java 17) — bump it in lockstep with the
# version under /opt/spark on your cluster.

ARG SPARK_IMAGE=apache/spark:4.0.0-java17

FROM $SPARK_IMAGE AS spark-runtime

FROM sbtscala/scala-sbt:eclipse-temurin-jammy-17.0.10_7_1.9.9_2.13.13 AS build
WORKDIR /build
# compile against the SAME Spark jars the runtime will provide
COPY --from=spark-runtime /opt/spark/jars /opt/spark/jars
ENV SPARK_GRAFT_JARS=/opt/spark/jars
COPY build.sbt ./
COPY project/build.properties ./project/
COPY src ./src
RUN sbt -batch package

FROM spark-runtime
USER root
RUN mkdir -p /opt/graft /data/corpus /data/warehouse /data/out \
    && chown -R spark:spark /opt/graft /data
COPY --from=build --chown=spark:spark \
    /build/target/scala-2.13/*.jar /opt/graft/graft.jar
COPY --chown=spark:spark docker/entrypoint.sh /opt/graft/entrypoint.sh
RUN chmod +x /opt/graft/entrypoint.sh
USER spark
WORKDIR /opt/graft

# Where the engine reads its corpus and writes its warehouse; compose
# mounts these. GRAFT_API_KEY enables the live fetch path (offline
# fixture pipeline otherwise — same DAG, canned payloads).
ENV GRAFT_SF_DIR=/data/corpus \
    GRAFT_OUT_DIR=/data/out \
    GRAFT_WAREHOUSE=/data/warehouse \
    SPARK_GRAFT_CPUS=4

ENTRYPOINT ["/opt/graft/entrypoint.sh"]
CMD ["pipeline"]
