from s3_access_logs_spark.cli import main

raise SystemExit(main())
