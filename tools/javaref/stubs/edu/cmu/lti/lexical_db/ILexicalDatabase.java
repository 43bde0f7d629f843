package edu.cmu.lti.lexical_db;
/** Compile-time stand-in for ws4j's lexical DB interface (jar not available
 *  in this environment). See tools/javaref/README.md. */
public interface ILexicalDatabase {
}
