package edu.cmu.lti.lexical_db;
/** Compile-time stand-in; no WordNet data is shipped. */
public class NictWordNet implements ILexicalDatabase {
    public NictWordNet() {}
}
