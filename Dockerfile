# Cron-job packaging parity with the reference image
# (/root/reference/Dockerfile:1-11): one container, env-var configured,
# exits when the hour is exported. The reference ships pandas+s3fs and runs
# cmd/export.py; this engine ships pyspark and runs the module entry point,
# which is the same contract (SRC/DST/TRACKING_DST/HOUR/TIMEOUT envs,
# exit 0 on success or already-done, non-zero on preflight/timeout failure).
FROM python:3.11-slim

# Spark needs a JRE; everything else is pure-Python.
RUN apt-get update \
    && apt-get install --no-install-recommends -y openjdk-17-jre-headless \
    && rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

# pillow backs operators/multimodal.decode_pixels for non-PNG formats
# (JPEG etc.); PNG decode also has a pure-stdlib fallback, so the image
# pipeline degrades gracefully where pillow is absent.
RUN pip install --no-cache-dir --upgrade pip \
    && pip install --no-cache-dir pyspark==4.1.2 pyarrow pandas numpy pillow

# pip pyspark does NOT bundle the S3A filesystem. For s3a:// SRC/DST the
# hadoop-aws + aws-sdk-bundle jars matching the bundled Hadoop version
# must be provided at deploy time — either bake them in here:
#   ADD https://repo1.maven.org/maven2/org/apache/hadoop/hadoop-aws/... \
#       /usr/local/lib/python3.11/site-packages/pyspark/jars/
# or pass --conf spark.jars.packages=org.apache.hadoop:hadoop-aws:<ver>
# via SPARK_SUBMIT_OPTS. Not baked in: this build must stay
# network-free, and the version must match the deploy cluster's Hadoop.
# file:// and hdfs:// paths work as shipped.

COPY s3_access_logs_spark /app/s3_access_logs_spark
WORKDIR /app

# Local-mode defaults; on a cluster, submit with your own master/deploy
# confs instead (spark.master overrides this env).
ENV SPARK_LOCAL_IP=127.0.0.1

CMD ["python", "-m", "s3_access_logs_spark"]
