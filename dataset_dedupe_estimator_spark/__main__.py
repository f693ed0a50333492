from dataset_dedupe_estimator_spark.cli import main

raise SystemExit(main())
