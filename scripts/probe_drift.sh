#!/bin/bash
# A/B drift probe: alternate r4-HEAD and r6-HEAD builds, same sitting.
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
R4CP="/tmp/repo_r4/target/scala-2.13/classes:/opt/spark/jars/*"
R6CP="/tmp/probe_r6_classes:/opt/spark/jars/*"
QS="ts_zscore_outliers events_json_extract q_grouping_sets p1_null_audit q_rollup_revenue q1_pricing_summary d1_hist_quantity q_set_ops q_unpivot_measures q_supplier_rank"
for q in $QS; do
  for build in r4 r6; do
    CP=$([ $build = r4 ] && echo "$R4CP" || echo "$R6CP")
    echo "== $build $q"
    java $OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$CP" graft.tools.TimeQuery "$q" /root/testdata/sf0.1 5 2>/dev/null \
      | grep TIMEQUERY
  done
done
