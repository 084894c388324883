from codetoneo4j_ray.cli import main

raise SystemExit(main())
