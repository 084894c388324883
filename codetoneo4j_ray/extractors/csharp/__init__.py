"""C# extraction: lexer → declaration parser → symbol/mention emission.

A from-scratch, pure-Python "Roslyn-equivalent" front end reproducing the
reference's symbol keys (CSharpErrorMessageFormat displays,
``Graph/Mapping/SymbolMapper.cs:43-47``), FQNs (FullyQualifiedFormat),
accessibility gates, CONTAINS/DEPENDS_ON/INVOKES extraction
(``Technologies/DotNet/CSharp/RoslynSymbolProcessor.cs``,
``MemberDependencyExtractor.cs``) — without a compiler.

Known deltas vs the Roslyn semantic model (documented, recall-only for the
resolved-edge set): user-defined-operator / conversion / method-group /
implicit-conversion INVOKES are not detected; overload resolution is
arity-based, not type-based; calls inside interpolated-string holes are
not seen.
"""
