package edu.cmu.lti.ws4j;
import edu.cmu.lti.lexical_db.ILexicalDatabase;
/** Stand-in base class for ws4j relatedness calculators. */
public abstract class RelatednessCalculator {
    protected ILexicalDatabase db;
    public RelatednessCalculator(ILexicalDatabase db) { this.db = db; }
    public abstract double calcRelatednessOfWords(String w1, String w2);
}
