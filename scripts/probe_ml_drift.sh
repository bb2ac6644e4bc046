#!/bin/bash
# ML-query A/B drift probe (round-7): the round-6 driver bench showed
# m3_automl_train_eval at 65.7 s vs 7.75 s r5-warm with zero code
# change in ml/ — the relational probe (probe_drift.sh) proved host
# noise for relational queries but contained no ML query. Same
# method here: alternate r5-HEAD (01ec8e4, built in a /tmp worktree)
# and r7-HEAD builds in ONE sitting, plain `java` with frozen classes
# dirs, 5 reps each, min-of-5, solo host.
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
R5CP="/tmp/repo_r5/target/scala-2.13/classes:/opt/spark/jars/*"
R7CP="${R7CP:-/tmp/probe_r7_classes}:/opt/spark/jars/*"
QS="m3_automl_train_eval m4_automl_classify e2e_readme_protocol"
for q in $QS; do
  for build in r5 r7; do
    CP=$([ $build = r5 ] && echo "$R5CP" || echo "$R7CP")
    echo "== $build $q"
    java $OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$CP" graft.tools.TimeQuery "$q" /root/testdata/sf0.1 5 2>/dev/null \
      | grep TIMEQUERY
  done
done
