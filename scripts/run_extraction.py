"""spark-submit entry point (absolute imports only — this file is executed
as __main__, the package arrives via --py-files)."""

from doctor_spark.pipeline import main

if __name__ == "__main__":
    main()
